"""crypto_market_data_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference repo ``7xxogre/Crypto-Market-Data-ETL`` (a Kafka -> Spark
streaming/batch crypto ETL), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; we never hand-schedule),
- deterministic aggregates (``min_by``/``max_by`` instead of order-dependent
  ``first``/``last`` — SURVEY.md §7.3 item 3),
- scale-aware physical shapes (bucketed as-of join instead of a
  BroadcastNestedLoopJoin band join; integer-cents arithmetic where
  float-summation order would break reproducibility),
- Structured Streaming for the streaming surface,
- plus the LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal column plumbing).

Layout:
    session     SparkSession construction + runtime tuning for foreign sessions
    schemas     the reference's explicit StructType registry + testdata loaders
    functions/  scalar/derive column expressions (SURVEY §2.2, §2.7)
    operators/  composable DataFrame->DataFrame operators (SURVEY §2.3-2.9)
    plans/      end-to-end query definitions + DuckDB oracle SQL
    sources/    file/Kafka source+sink builders (SURVEY §2.1)
    streaming/  Structured Streaming queries + stateful ops (SURVEY §2.8)
"""

__version__ = "0.1.0"
