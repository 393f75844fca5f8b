"""Oracle-differential tests: every registered query with an oracle must
hash-match DuckDB at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle import compare


def _cases():
    from data_finder_comparator_spark.plans.catalog import ORACLES, QUERIES

    return [(name, QUERIES[name], ORACLES[name]) for name in sorted(ORACLES)]


@pytest.mark.parametrize("name", [c[0] for c in _cases()])
def test_oracle_parity(spark, name):
    from data_finder_comparator_spark.plans.catalog import ORACLES, QUERIES

    df = QUERIES[name](spark, SF_ORACLE)
    ok, msg = compare(df, ORACLES[name], SF_ORACLE)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark):
    from data_finder_comparator_spark.plans.catalog import QUERIES

    for name, fn in QUERIES.items():
        n = fn(spark, SF_ORACLE).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
