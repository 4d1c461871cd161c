"""mobility_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL project
(jakublaba/mobility-etl, surveyed in /root/repo/SURVEY.md): its
ingestion operators (GTFS feed, scraped delays, weather snapshots),
the relational query surface its star-schema data model implies, a
Structured-Streaming rendering of its hourly cadence, and the
large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) it grows toward.

Design stance (SURVEY.md §1.4, §4): DataFrame/SQL everywhere, explicit
schemas, Catalyst does the optimizing, Parquet + partition layout does
the physical design, pandas UDFs only where built-ins cannot express
the semantics. No RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"

from mobility_etl_spark.session import get_spark, ensure_session_defaults  # noqa: F401
