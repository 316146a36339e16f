"""Learned quality classifier over the heuristic feature surface
(§2.11: the trainable counterpart of ``text_analysis.quality_features``
— fastText-style quality classifiers are the standard upgrade once a
labeled seed set exists; e.g. "looks like a curated reference corpus"
vs "random crawl").

Spark-first: training is ``pyspark.ml`` LogisticRegression — the
iterations are driver-coordinated but each pass is a distributed
treeAggregate over the feature vectors, so the corpus never leaves the
executors; scoring is a pure model transform (one narrow map). The
feature columns come from :func:`quality_features` +
:func:`repetition_features`, so the whole pipeline stays JVM-side until
the (tiny) model coefficients.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FEATURE_COLS = [
    "n_tokens",
    "avg_word_len",
    "punct_ratio",
    "stopword_ratio",
    "dup_word_frac",
    "top_word_frac",
    "dup_bigram_frac",
]


def build_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, FEATURE_COLS...) from raw text — one scan + the repetition
    aggregations; everything JVM-side."""
    from kfai_pipeline_spark.operators.text_analysis import (
        quality_features,
        repetition_features,
    )

    q = quality_features(df.select(id_col, text_col), text_col).select(
        id_col, "n_tokens", "avg_word_len", "punct_ratio", "stopword_ratio"
    )
    r = repetition_features(df, text_col, id_col).select(
        id_col, "dup_word_frac", "top_word_frac", "dup_bigram_frac"
    )
    return q.join(r, id_col)


def train_quality_model(
    features: DataFrame, label_col: str = "label", max_iter: int = 20
):
    """Fit LogisticRegression on FEATURE_COLS -> returns the fitted
    PipelineModel (assembler + scaler + LR)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="__raw"),
            StandardScaler(inputCol="__raw", outputCol="__feat"),
            LogisticRegression(
                featuresCol="__feat", labelCol=label_col, maxIter=max_iter
            ),
        ]
    )
    return pipe.fit(features)


def score_quality(model, features: DataFrame, out_col: str = "quality_prob") -> DataFrame:
    """Append P(label=1) — a pure distributed transform, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(features)
    return scored.withColumn(
        out_col, F.round(vector_to_array("probability")[1], 4)
    ).drop("__raw", "__feat", "rawPrediction", "probability", "prediction")
