"""net7_etl_bus_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL service (an event-driven .NET service
bus ETL worker; see SURVEY.md), rebuilt on the Spark DataFrame / SQL /
Structured Streaming stack and extended with the relational, windowed,
streaming and LLM-data-pipeline operators a 100 TB training-data
pipeline needs.

Design principles (see SURVEY.md §7):
  * Declare logical plans with the DataFrame/SQL API; let Catalyst +
    AQE pick physical strategy (joins, partition coalescing, skew).
  * Stay JVM-side: built-in ``pyspark.sql.functions`` in hot paths;
    Arrow-batched ``applyInPandas``/``mapInPandas`` only where built-in
    operators cannot express the semantics (as-of join, enrichment).
  * Every operator is registered in :mod:`net7_etl_bus_spark.plans.registry`
    together with an ANSI-SQL oracle so correctness is differentially
    checked against DuckDB.
"""

__version__ = "0.1.0"
