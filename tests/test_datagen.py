"""Standalone data generator: schema-compatible tables at any SF, verified
by running real queries AND their DuckDB oracles against the generated
directory (datagen.py)."""

import pytest

from mapreduce_model_spark.datagen import generate
from mapreduce_model_spark.registry import TABLES, table
from tests.oracle_harness import compare_query

# a slice spanning every generated table family: star schema, documents,
# embeddings, events
CHECK = [
    "groupby_agg",
    "join_multi",
    "inverted_index",
    "dedup_exact",
    "similarity_topk",
    "stream_tumbling",
]


@pytest.fixture(scope="module")
def gen_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gen") / "sf")
    counts = generate(spark, 0.0003, out)
    assert set(counts) == set(TABLES)
    assert all(n > 0 for n in counts.values())
    return out


def test_generated_schemas_match_harness(spark, gen_dir, sf_dir):
    for t in TABLES:
        gen_fields = {f.name for f in table(spark, gen_dir, t).schema.fields}
        harness_fields = {f.name for f in table(spark, sf_dir, t).schema.fields}
        assert gen_fields == harness_fields, t


@pytest.mark.parametrize("name", CHECK)
def test_queries_hold_on_generated_data(spark, gen_dir, name):
    """The engine and its oracles must agree on generated data exactly as
    they do on the harness parquet — different layout (directory tables,
    µs timestamps), same semantics."""
    assert compare_query(spark, gen_dir, name) is None
