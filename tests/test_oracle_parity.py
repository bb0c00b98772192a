"""Every registered query must match its DuckDB oracle locally (sf0.001)
before the driver checks it at sf0.01."""

import pytest

from mapreduce_model_spark.registry import ORACLE_SQL, QUERIES
from tests.oracle_harness import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    mismatch = compare_query(spark, sf_dir, name)
    assert mismatch is None, f"{name}: {mismatch}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a sane schema."""
    for name in sorted(set(QUERIES) - set(ORACLE_SQL)):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
