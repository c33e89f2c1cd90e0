"""The correctness gate, mirrored locally: every registered query either
hash-matches its DuckDB oracle or (rows-only queries) runs and returns a
stable schema. Mirrors the reference's golden-file strategy
(/root/reference/sql/core/src/test/scala/org/apache/spark/sql/SQLQueryTestSuite.scala)
with DuckDB as the golden-result generator.
"""

from __future__ import annotations

import pytest

from sol_spark.oracle import compare
from sol_spark.registry import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name: str, spark, sf_dir: str) -> None:
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # Rows-only contract: runs, has a schema, row count is sane.
        assert df.columns
        assert df.count() >= 0
        return
    ok, msg = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {msg}"
