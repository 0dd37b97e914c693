"""Sinks: Kafka producer frame + JDBC idempotent upsert (SURVEY §2.2
Q04–Q05, reference R7 ``kafka-database-import.go:208-210``)."""
