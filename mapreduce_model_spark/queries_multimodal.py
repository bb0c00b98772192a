"""Multimodal-column queries: binary payload + struct/array/map round-trip
(oracle-checked) and the mapInPandas feature-extraction path (rows-only —
pandas UDFs are not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_model_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    sample_frames,
)
from mapreduce_model_spark.registry import query, table


@query(
    "multimodal_cols",
    oracle="""
SELECT doc_id,
       octet_length(text::BLOB)          AS payload_len,
       md5(text)                         AS payload_md5,
       lang                              AS meta_lang,
       source                            AS meta_source,
       n_chars                           AS meta_n_chars,
       'utf8-blob'                       AS meta_format,
       len(string_split(source, 'c'))    AS src_parts
FROM documents
WHERE octet_length(text::BLOB) > 64
""",
)
def multimodal_cols(spark, sf_dir):
    """Binary + nested columns carried through scan/filter/projection:
    payload bytes hashed and measured, metadata struct fields projected
    back out — proves BinaryType/StructType/ArrayType survive the engine."""
    docs = attach_payload(table(spark, sf_dir, "documents"))
    return (
        docs.filter(F.octet_length("payload") > 64)
        .withColumn("src_parts", F.size(F.split("source", "c", -1)).cast("long"))
        .select(
            "doc_id",
            F.octet_length("payload").cast("long").alias("payload_len"),
            F.md5("payload").alias("payload_md5"),
            F.col("meta.lang").alias("meta_lang"),
            F.col("meta.source").alias("meta_source"),
            F.col("meta.n_chars").alias("meta_n_chars"),
            F.col("meta.format").alias("meta_format"),
            "src_parts",
        )
    )


@query("multimodal_features")  # mapInPandas — rows-only check
def multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction over binary payloads (the decode
    stub's plumbing): deterministic fake features, real mapInPandas shape."""
    media = attach_payload(table(spark, sf_dir, "documents"))
    return extract_features(media)


@query(
    "multimodal_frames",
    oracle="""
WITH f AS (
    SELECT doc_id,
           octet_length(text::BLOB) AS n,
           unnest(range(0, CAST(ceil(octet_length(text::BLOB) / 256.0) AS BIGINT))) AS j
    FROM documents
)
SELECT doc_id,
       CAST(j AS INTEGER) AS frame_idx,
       CAST(least(256, n - j * 256) AS INTEGER) AS frame_len
FROM f WHERE j % 4 = 0
""",
)
def multimodal_frames(spark, sf_dir):
    """Frame sampling (video/audio shape): payloads split into 256-byte
    frames, every 4th emitted. The oracle checks the sampling geometry
    (doc, index, length) — the binary frame column itself is exercised by
    tests (BinaryType is not hash-comparable across engines)."""
    media = attach_payload(table(spark, sf_dir, "documents"))
    return sample_frames(media, frame_bytes=256, every_k=4).select(
        "doc_id", "frame_idx", "frame_len"
    )


@query(
    "multimodal_resize",
    oracle="""
SELECT doc_id,
       CAST(octet_length(text::BLOB) AS INTEGER)      AS orig_bytes,
       CAST(128 AS INTEGER)                           AS resized_bytes,
       octet_length(text::BLOB) > 128                 AS truncated
FROM documents
""",
)
def multimodal_resize(spark, sf_dir):
    """Payload resize (thumbnail/re-encode shape): truncate-or-pad to a
    fixed 128 bytes via mapInPandas. The oracle checks the size metadata;
    the byte-exact payload contract (prefix / zero-pad) is pinned in
    tests/test_similarity_multimodal.py."""
    from mapreduce_model_spark.operators.multimodal import resize_media

    media = attach_payload(table(spark, sf_dir, "documents"))
    return resize_media(media, target_bytes=128).select(
        "doc_id", "orig_bytes", "resized_bytes", "truncated"
    )
