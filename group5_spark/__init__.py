"""group5_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
pipeline ``120925-Data-Engineering/Group5`` ("StreamFlow") on idiomatic
Spark: DataFrame/Spark SQL for the relational surface, a Parquet-backed
medallion warehouse (bronze/silver/gold) instead of Snowflake, a
Spark-SQL measure library instead of DAX, and Structured-Streaming
variants of the micro-batch ingestion path.

Layout
------
- ``session``      SparkSession factory (AQE, UTC, Arrow defaults)
- ``schemas``      explicit StructType schemas for every entity
- ``catalog``      testdata table loading / temp-view registration
- ``operators``    relational operator layer (joins, windows, set ops,
                   column ops, flatten/explode)
- ``functions``    measure library (revenue, time-intelligence, funnel)
- ``sources``      landing NDJSON, bronze loader, Kafka (gated)
- ``medallion``    silver/gold builders + refresh orchestration
- ``generator``    seeded synthetic event generator (StreamFlow parity)
- ``streaming``    Structured Streaming jobs (AvailableNow micro-batch)
- ``extensions``   large-scale training-data ops: dedup, similarity
                   search, text analysis, multimodal columns
"""

__version__ = "0.1.0"
