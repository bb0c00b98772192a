"""Delimited/JSON file sources — the generalized A2 scan surface.

The reference reads exactly one format: whitespace-tokenized text files
(main.cc:64-80). A general engine ingests CSV and JSON-lines too; these
helpers wrap ``spark.read`` with the two contracts that matter at 100 TB:

- **Explicit schema, always.** Schema inference is a full extra pass over
  the data before the real job starts (and on JSON it samples, so two runs
  can disagree). Every reader here requires a schema.
- **Explicit error posture.** ``FAILFAST`` (default) aborts the job on the
  first malformed record — corrupt input should fail loudly, like the
  reference's hard error on a missing file (main.cc:66-70). ``PERMISSIVE``
  quarantines bad lines into ``_corrupt_record`` for a dead-letter audit
  instead; callers opt in deliberately.

Parquet stays the primary format (columnar, statistics, pushdown —
``registry.table``); CSV/JSONL are ingest formats, read once and landed to
parquet (``sinks.write_sized``), never scanned repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["read_csv", "read_jsonl", "read_orc", "write_orc", "with_corrupt_capture"]

CORRUPT_COL = "_corrupt_record"


def with_corrupt_capture(schema: StructType) -> StructType:
    """Schema + the quarantine column PERMISSIVE mode fills for bad rows."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str,
    header: bool = True,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """CSV scan with a mandatory schema and explicit malformed-row posture.

    In PERMISSIVE mode the returned frame carries ``_corrupt_record``
    (null for clean rows) — filter on it to split good rows from the
    dead-letter stream.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if mode.upper() == "PERMISSIVE":
        schema = with_corrupt_capture(schema)
    return (
        spark.read.options(header=header, mode=mode, **options)
        .schema(schema)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """JSON-lines scan (one object per line — the splittable JSON layout;
    multiline JSON documents are not splittable and don't scale)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if mode.upper() == "PERMISSIVE":
        schema = with_corrupt_capture(schema)
    return spark.read.options(mode=mode, **options).schema(schema).json(path)


def read_orc(
    spark: SparkSession, path: str | list[str], **options
) -> DataFrame:
    """ORC scan — the other columnar interchange format. Self-describing
    (schema travels with the file) and pushdown-capable like parquet:
    filters reach the reader as ORC predicate pushdown (searchable
    arguments over stripe/row-group statistics) and projections prune
    columns at the stripe level; both are vectorized in Spark's native
    reader."""
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    """Land a frame as ORC (zstd, matching the parquet sink posture)."""
    df.write.mode(mode).options(compression="zstd", **options).orc(path)


def read_xml(
    spark: SparkSession, path: str | list[str], schema: str, row_tag: str = "row", **options
) -> DataFrame:
    """XML scan (Spark 4 built-in ``xml`` source) — the
    document-interchange format enterprise feeds still arrive in. Schema
    is mandatory here for the same reason as CSV/JSONL: inference is a
    second full pass over 100 TB and silently widens types; an explicit
    DDL makes the scan single-pass and the contract checkable."""
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", row_tag)
        .options(**options)
        .load(path)
    )


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite", **options
) -> None:
    """Land a frame as XML, one element per row under ``rowTag``."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).options(**options).save(
        path
    )


def read_binary_files(
    spark: SparkSession, path: str | list[str], glob: str | None = None, **options
) -> DataFrame:
    """``binaryFile`` scan — the raw-asset ingest path for multimodal
    corpora (images/audio/video land as opaque ``content: binary`` plus
    path/mtime/length metadata; operators/multimodal.py takes it from
    there). ``glob`` maps to ``pathGlobFilter`` so a mixed asset tree can
    be ingested per-modality without listing twice; recursive lookup is on
    by default (asset trees nest). Whole files are read — Spark caps each
    file at ``spark.sql.sources.binaryFile.maxLength`` (int32 max) and one
    file never splits, so at 100 TB parallelism comes from file COUNT;
    pack small assets into archives upstream or this scan becomes a
    small-files listing problem (same economics as sinks.py compaction)."""
    r = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.options(**options).load(path)
