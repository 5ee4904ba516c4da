"""Runtime operators: materializations, incremental strategies, SCD2
snapshots, and the schema-test library (SURVEY.md §2.1, §2.8, §2.9, §5)."""
