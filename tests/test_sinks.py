"""File-sink round trips: the letter-file text sink (reference A15) and the
partitioned-parquet scale path both must reproduce their source exactly."""

import glob
import os

from pyspark.sql import functions as F

from mapreduce_model_spark.operators.inverted_index import (
    format_output,
    invert,
    write_letter_files,
)
from mapreduce_model_spark.registry import table


def test_letter_file_sink_round_trip(spark, sf_dir, tmp_path):
    """write_letter_files emits letter=<c>/ dirs whose concatenated lines
    equal format_output, with per-letter (n_docs DESC, word ASC) order."""
    idx = invert(table(spark, sf_dir, "documents").limit(300))
    out = str(tmp_path / "letters")
    write_letter_files(idx, out)

    expected: dict[str, list[str]] = {}
    for r in format_output(idx).collect():  # invert is letter-ordered
        expected.setdefault(r.letter, []).append(r.line)

    got: dict[str, list[str]] = {}
    for d in sorted(glob.glob(os.path.join(out, "letter=*"))):
        letter = d.rsplit("=", 1)[1]
        lines: list[str] = []
        for part in sorted(glob.glob(os.path.join(d, "part-*"))):
            with open(part) as fh:
                lines += [l.rstrip("\n") for l in fh if l.strip()]
        got[letter] = lines

    assert set(got) == set(expected)
    for letter in expected:
        assert got[letter] == expected[letter], f"letter {letter}"


def test_partitioned_parquet_round_trip(spark, sf_dir, tmp_path):
    """The 100 TB sink shape: parquet partitioned on the grouping column;
    read-back must be value-identical (partition column round-trips through
    the directory encoding)."""
    idx = invert(table(spark, sf_dir, "documents").limit(300)).select(
        "letter", "word", "docs", "n_docs"
    )
    out = str(tmp_path / "pq")
    idx.write.mode("overwrite").partitionBy("letter").parquet(out)
    back = spark.read.parquet(out)
    a = {(r.word, tuple(r.docs), r.n_docs, r.letter) for r in idx.collect()}
    b = {(r.word, tuple(r.docs), r.n_docs, r.letter) for r in back.collect()}
    assert a == b


def test_write_observed_metrics_match_data(spark, sf_dir, tmp_path):
    """df.observe metrics ride the write job: rows + null counts equal the
    ground truth without a second scan of the input."""
    from mapreduce_model_spark.registry import table
    from mapreduce_model_spark.sinks import write_observed
    from pyspark.sql import functions as F

    df = table(spark, sf_dir, "orders").withColumn(
        "maybe_null", F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice"))
    )
    out = str(tmp_path / "observed")
    m = write_observed(df, out, metric_cols=["maybe_null", "o_orderstatus"])
    n = df.count()
    n_null = df.filter(F.col("maybe_null").isNull()).count()
    assert m["rows"] == n
    assert m["nulls_maybe_null"] == n_null
    assert m["nulls_o_orderstatus"] == 0
    assert spark.read.parquet(out).count() == n
