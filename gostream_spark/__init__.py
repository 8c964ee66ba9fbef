"""gostream_spark — a PySpark-native analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
``l0vest0rm/gostream`` reference (a Storm-style Go stream-processing
framework; see SURVEY.md — the reference tree is empty this round, so
the binding spec is SURVEY.md §2's operator inventory and the driver's
DuckDB-oracle contract).

Design stance (SURVEY.md §7): not a port. No topology/spout/bolt
classes — the engine is a library of composable DataFrame operators
(``gostream_spark.operators``), a query catalog wired to the driver
contract (``gostream_spark.queries`` + ``gostream_spark.registry``),
and a Structured Streaming facade (``gostream_spark.streaming``) for
the reference's stateful/streaming identity.
"""

from gostream_spark.registry import all_queries, get_query
from gostream_spark.session import get_spark

__all__ = ["get_spark", "all_queries", "get_query"]
__version__ = "0.1.0"
