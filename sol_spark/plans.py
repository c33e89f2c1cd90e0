"""Physical-plan inspection helpers.

The plan-shape assertions (tests/test_plans.py, tests/test_sources.py) are
this engine's analog of the reference's plan-compilation suites
(/root/reference/sql/core/src/test/scala/org/apache/spark/sql/TPCHQuerySuite.scala):
they pin the 100 TB design claims — pushdown, broadcast, top-k, partial
aggregation, bucketed no-shuffle joins — to the actual optimizer output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain output as a string (what df.explain prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def explain_extended(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "extended")
