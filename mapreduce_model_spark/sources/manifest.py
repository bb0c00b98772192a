"""Manifest-driven text corpus source — reference operators A1/A2.

The reference input format (main.cc:178-197 ``read_input_file``) is a text
file whose first token is a count ``N`` followed by ``N`` file paths. The
**1-based manifest position is the document id** (main.cc:79 inserts
``id_file + 1``) — identity is positional, not path-based: two entries naming
the same file are two documents. A missing listed file is a hard error
(main.cc:66-70; manifest itself main.cc:182-186).

Spark mapping: the manifest is tiny driver-side metadata (a file list), the
corpus is the big data. We read all listed files in one distributed
``spark.read.text`` scan and attach ids by joining ``input_file_name()``
against a broadcast path→id map built from manifest order. ``doc_id`` must be
the manifest ordinal — never a path hash (SURVEY.md §1.1).

Scale: one scan over N files; the path→id map is O(N) strings broadcast to
executors — fine up to tens of millions of files; beyond that, materialize
the manifest as a small parquet dim and broadcast-join on path.
"""

from __future__ import annotations

import os
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_manifest", "read_corpus", "read_paths"]


def read_manifest(manifest_path: str) -> list[str]:
    """Parse the ``N\\npath...`` manifest → ordered path list (main.cc:178-197).

    Paths are resolved relative to the manifest's directory (the reference is
    run from the checker dir with relative paths, checker.sh:141-155).
    """
    base = os.path.dirname(os.path.abspath(manifest_path))
    with open(manifest_path) as fh:
        tokens = fh.read().split()
    if not tokens:
        raise ValueError(f"empty manifest: {manifest_path}")
    n = int(tokens[0])
    paths = tokens[1 : n + 1]
    if len(paths) != n:
        raise ValueError(
            f"manifest declares {n} files but lists {len(paths)}: {manifest_path}"
        )
    resolved = []
    for p in paths:
        full = p if os.path.isabs(p) else posixpath.join(base, p)
        if not os.path.exists(full):  # hard error, main.cc:66-70
            raise FileNotFoundError(f"manifest entry missing on disk: {full}")
        resolved.append(full)
    return resolved


def read_corpus(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Manifest → ``DataFrame[doc_id: int, text: string]``, one row per line.

    ``doc_id`` is the 1-based manifest ordinal. Tokenization treats newlines
    as plain whitespace (main.cc:73), so per-line rows feed ``tokenize``
    unchanged — the (word, doc_id) set is identical to whole-file reading.
    """
    return read_paths(spark, read_manifest(manifest_path))


def read_paths(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Ordered path list → ``DataFrame[doc_id, text]`` (1-based positional
    ids). The programmatic front door for callers whose file lists don't
    come from a whitespace-tokenized manifest (which cannot represent
    paths containing spaces — reference ``operator>>`` semantics)."""
    id_rows = [(os.path.abspath(p), i + 1) for i, p in enumerate(paths)]
    path_to_id = spark.createDataFrame(id_rows, "path: string, doc_id: int")
    # Read each distinct file ONCE — a path listed twice is two doc ids
    # (main.cc:79 positional identity), and the path→id join below fans
    # each line out to every id holding that path; passing the duplicate
    # to spark.read.text as well would double the lines per id.
    distinct_paths = list(dict.fromkeys(paths))
    # input_file_name() is a URI: percent-encoded (space → %20) but with
    # literal '+'. url_decode is form-decoding ('+' → ' '), so protect
    # literal plus as %2B first — yields the exact filesystem path.
    uri_path = F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
    decoded = F.url_decode(F.regexp_replace(uri_path, r"\+", "%2B"))
    text = spark.read.text(distinct_paths).withColumn("path", decoded)
    return text.join(F.broadcast(path_to_id), "path").select("doc_id", F.col("value").alias("text"))
