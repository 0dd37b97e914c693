"""Custom operators Spark lacks as single primitives, each expressed as a
composition of DataFrame ops (SURVEY §4.2: zero custom Catalyst rules
needed — everything rides built-in pushdown/AQE)."""
