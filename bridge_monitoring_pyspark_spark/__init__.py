"""bridge_monitoring_pyspark_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``hamdahiqbal/bridge-monitoring-pyspark``
(a medallion Bronze→Silver→Gold Structured Streaming pipeline over IoT
bridge-sensor events), extended with LLM-training-data pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Layout:
    session     SparkSession factory with scale-aware defaults (AQE, UTC, Arrow)
    sources     batch/streaming readers + sinks, testdata loader, schema registry
    functions   scalar/vector/text column-expression helpers (JVM-side first)
    operators   reusable relational + LLM-data operators (DQ split, windowed agg,
                top-k, dedup, similarity, multimodal)
    plans       the named query catalog wired into __spark_entry__.py
    streaming   bronze/silver/gold Structured Streaming jobs (availableNow-testable)

Everything here is public-API PySpark (DataFrame/SQL/Catalyst/Structured
Streaming); no custom Catalyst rules are required for reference parity
(see SURVEY.md §4).
"""

__version__ = "0.1.0"
