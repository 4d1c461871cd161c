"""Oracle-checked query surface (SURVEY.md §2.B/§2.C inventory).

Each module registers (PySpark builder, DuckDB oracle SQL) pairs via
mobility_etl_spark.registry.register. Builders take (spark, sf_dir)
and must alias every computed column to the same name the oracle uses
(the driver sorts columns by name before value-hashing).
"""
