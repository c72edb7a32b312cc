"""beam_scala_examples_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of saikocat/beam-scala-examples
(the Scala port of the Apache Beam examples), rebuilt Spark-first.

Layout (see SURVEY.md §7.1):
  session.py    SparkSession factory (UTC, AQE, Arrow)
  tables.py     parquet table loaders for the driver star schema
  operators/    reusable operator library (text, windows, topk, fold,
                state, dedup, similarity, textstats, multimodal)
  queries/      one module per reference pipeline family; each query is
                ``(spark, sf_dir) -> DataFrame`` registered in
                ``queries.QUERIES`` with DuckDB oracle SQL in
                ``queries.ORACLE``
  streaming/    Structured Streaming twins (watermarks, update mode,
                stateful ops, pane tagging)
"""

__version__ = "0.1.0"
