"""Trainable document-quality classifier — the LEARNED counterpart of
functions/text.quality_score's fixed-weight heuristic.

Production corpus curation (C4, RefinedWeb, FineWeb) trains a small
classifier over cheap text statistics (and/or a seed of known-good
pages) instead of hand-tuning thresholds. This module restates that on
Spark: features are the SAME staged, codegen'd text statistics the
heuristic uses (one scan, no Python), the model is MLlib logistic
regression (distributed L-BFGS fit — scales to corpus-sized training
sets, unlike a driver-side sklearn fit), and inference is a per-row
vectorized map with no shuffle.

The features are deliberately model-agnostic statistics rather than
raw tokens: a feature row is ~7 doubles regardless of document length,
so the training shuffle is O(rows), never O(text) — at the 100 TB
design point the fit moves megabytes, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_vectorsearch_spark.functions import text as T

QUALITY_FEATURES = [
    "f_alpha_ratio",
    "f_stop_ratio",
    "f_mean_token_len",
    "f_n_tokens",
    "f_n_chars",
    "f_upper_ratio",
    "f_digit_ratio",
]


def _len_ratio(text: Column, klass: str) -> Column:
    kept = F.length(F.regexp_replace(text, f"[^{klass}]", ""))
    return kept.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, f_*) feature frame: one scan, tokens staged once (the
    quality_score discipline), every statistic a codegen'd expression.

    NULL text coalesces to "" and every ratio is guarded against the
    empty document — a single bad row must neither crash the
    VectorAssembler (nulls) nor silently poison the L-BFGS fit with
    NaNs (0/0 ratios), which NaN-propagate into coefficients and slip
    past probability range checks (NaN compares false)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    staged = docs.select(
        F.col(id_col),
        txt.alias("_text"),
        T.ws_tokens(txt).alias("_toks"),
    )
    empty_text = F.length("_text") == 0
    no_tokens = F.size("_toks") == 0
    return staged.select(
        id_col,
        F.when(empty_text, 0.0)
        .otherwise(T.alpha_ratio(F.col("_text")))
        .alias("f_alpha_ratio"),
        F.when(no_tokens, 0.0)
        .otherwise(T.stopword_ratio(F.col("_toks")))
        .alias("f_stop_ratio"),
        F.when(no_tokens, 0.0)
        .otherwise(T.mean_token_len(F.col("_toks")))
        .alias("f_mean_token_len"),
        F.size("_toks").cast("double").alias("f_n_tokens"),
        F.length("_text").cast("double").alias("f_n_chars"),
        _len_ratio(F.col("_text"), "A-Z").alias("f_upper_ratio"),
        _len_ratio(F.col("_text"), "0-9").alias("f_digit_ratio"),
    )


def train_quality_classifier(
    labeled_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit logistic regression on (text, label ∈ {0, 1}) — labels come
    from the caller (a curated seed set, heuristic-thresholded weak
    labels, or human judgments). Returns the fitted PipelineModel
    (assembler + LR); apply with :func:`score_quality_model`."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(labeled_docs, id_col, text_col).join(
        labeled_docs.select(id_col, label_col), id_col
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=QUALITY_FEATURES, outputCol="_raw"),
            # standardize: n_chars is O(10^3), ratios are O(1) — without
            # scaling the regularizer penalizes them asymmetrically
            StandardScaler(inputCol="_raw", outputCol="_features", withMean=True),
            LogisticRegression(
                featuresCol="_features",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality_model(
    model,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, quality_prob, quality_pred): P(label=1) per document — a
    per-row map over the feature projection, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(docs, id_col, text_col)
    scored = model.transform(feats)
    return scored.select(
        id_col,
        vector_to_array("probability").getItem(1).alias("quality_prob"),
        F.col("prediction").alias("quality_pred"),
    )
