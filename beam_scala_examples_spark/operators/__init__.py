"""Reusable operator library. Each module keeps the Spark-side operator
and (where useful) the matching DuckDB oracle SQL fragment generator next
to each other so cross-engine determinism is maintained in one place."""
