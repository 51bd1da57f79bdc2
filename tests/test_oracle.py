"""Run every registered query against its DuckDB oracle at sf0.001 —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from datafusion_bigtable_spark import queries as Q

from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", [n for n, s in Q.REGISTRY.items() if s.sql is not None])
def test_oracle_match(spark, sf_dir, con, name):
    spec = Q.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), con, spec.sql)


@pytest.mark.parametrize("name", [n for n, s in Q.REGISTRY.items() if s.sql is None])
def test_rows_only(spark, sf_dir, name):
    df = Q.REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
