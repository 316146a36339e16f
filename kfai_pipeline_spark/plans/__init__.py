"""Query-plan layer: the Mongo-style filter compiler and the RAG query
plan assembly (SURVEY.md §3.1, §4.3)."""

from kfai_pipeline_spark.plans.filter_compiler import build_filter, compile_filter

__all__ = ["build_filter", "compile_filter"]
