"""solspark — a PySpark-native analytics engine with the capability surface of
SymbioticLab/Sol (NSDI'20; a fork of Apache Spark 2.4.0).

Sol's query surface is exactly Spark SQL 2.4 + Structured Streaming (see
SURVEY.md §0); its novelty is execution-layer (task pipelining, shuffle
decoupling). This package re-expresses that capability surface on modern
PySpark: a tuned session profile (AQE, push-style shuffle configs, Arrow),
a declared + tested relational operator inventory (queries/), an LLM-data-
pipeline operator library (operators/), and Structured Streaming pipelines
(streaming/).
"""

from sol_spark.session import get_session, session_builder
from sol_spark.tables import TABLE_NAMES, load_tables

__all__ = ["get_session", "session_builder", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
