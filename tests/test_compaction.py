"""Sized writes and compaction: file counts hit the target, values survive."""

import glob
import os

from mapreduce_model_spark.registry import table
from mapreduce_model_spark.sinks import compact, write_sized


def _files(path: str, suffix: str = ".parquet") -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if f.endswith(suffix) and os.path.isfile(f)
    ]


def test_write_sized_controls_file_count(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")  # 500 rows at sf0.001
    out = str(tmp_path / "sized")
    write_sized(docs, out, target_rows_per_file=100)
    files = _files(out)
    assert len(files) == 5
    back = spark.read.parquet(out)
    assert back.count() == docs.count()


def test_compact_small_files(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    frag = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(frag)  # simulate a small-file mess
    assert len(_files(frag)) == 64

    out = str(tmp_path / "compacted")
    rows, n_files = compact(spark, frag, out, target_rows_per_file=250)
    assert rows == docs.count()
    assert len(_files(out)) == n_files == -(-rows // 250)
    a = {r.doc_id for r in spark.read.parquet(out).collect()}
    b = {r.doc_id for r in docs.collect()}
    assert a == b


def test_write_sized_partitioned_bounds_files_per_dir(spark, sf_dir, tmp_path):
    """Partitioned sized write: each letter directory gets about
    rows_in_dir/target files (salt splitter), and values round-trip."""
    from mapreduce_model_spark.operators.inverted_index import invert

    idx = invert(table(spark, sf_dir, "documents")).select(
        "letter", "word", "n_docs"
    )
    out = str(tmp_path / "sized_part")
    write_sized(idx, out, target_rows_per_file=2000, partition_by=["letter"])
    import glob as _glob
    import os as _os

    dirs = _glob.glob(_os.path.join(out, "letter=*"))
    assert dirs
    for d in dirs:
        n_rows = spark.read.parquet(d).count()
        n_files = len(_files(d))
        assert n_files <= max(2, -(-n_rows // 2000) + 2), (d, n_rows, n_files)
    back = spark.read.parquet(out)
    assert back.count() == idx.count()
