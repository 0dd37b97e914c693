"""kafka_database_import_spark — a PySpark-native analytics engine.

From-scratch rebuild of the capabilities of
``tidepool-org/kafka-database-import`` (a MongoDB→Kafka export job; see
/root/reference/kafka-database-import.go) as an idiomatic Apache Spark
engine: DataFrame/SQL batch operators, Structured Streaming pipelines
(Kafka source → JDBC sink via foreachBatch), and large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

The declared query surface lives in :mod:`kafka_database_import_spark.plans.catalog`;
every batch query there carries an ANSI-SQL oracle for DuckDB
differential testing.
"""

from kafka_database_import_spark.session import get_spark, EngineConfig

__all__ = ["get_spark", "EngineConfig"]
__version__ = "0.1.0"
