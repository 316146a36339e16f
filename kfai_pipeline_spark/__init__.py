"""kfai-pipeline-spark: a PySpark-native analytics engine.

Re-expresses the query and data-processing semantics of the reference
ETL + RAG pipeline (Jer-Pha/kfai-pipeline) as idiomatic Spark
DataFrame/SQL plans, and extends the operator surface with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
    session     SparkSession factory (UTC, AQE, tuned shuffle partitions)
    catalog     Parquet table loader / temp-view registration
    functions/  scalar function surface + Mongo-style filter compiler
    operators/  dedup, similarity, text analysis, chunker, as-of, sessionize
    queries/    declared correctness queries (SURVEY.md §2.12) + oracles
    pipeline/   reference ETL pipeline semantics (ingest, vector load, query path)
    streaming/  Structured Streaming twins of the incremental paths
"""

__version__ = "0.1.0"
