"""The local twin of the driver's correctness gate: every registered
query runs on Spark AND its DuckDB oracle at sf0.001; results must
hash-match (exact values — no tolerance — because our money pipelines
are exact-decimal by construction)."""

from __future__ import annotations

import pytest

from data_pipeline_2025_spark import registry

from .oracle import compare

SPECS = registry.load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_smoke):
    spec = SPECS[name]
    problems = compare(spec, spark, sf_smoke)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 1
