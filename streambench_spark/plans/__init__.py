"""Query plans: the YSB query (batch + streaming from one expression tree)
and the registry of named queries the driver verifies against DuckDB."""
