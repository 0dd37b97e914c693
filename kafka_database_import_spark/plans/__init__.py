from kafka_database_import_spark.plans.registry import Query, all_queries, query

__all__ = ["Query", "all_queries", "query"]
