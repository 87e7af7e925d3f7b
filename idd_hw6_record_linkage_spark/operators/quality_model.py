"""Trainable document-quality classifier — the learned counterpart of
the rule-based Gopher/C4 filter (functions.text_analysis
.reject_reason_expr): a fastText-style linear model over (a) the
engine's native quality signals and (b) a hashed bag-of-tokens, fit
with pyspark.ml LogisticRegression. Production pipelines use exactly
this shape to score web pages against a curated seed corpus (CCNet's
fastText quality filter); the engine keeps the whole lifecycle
distributed — featurize (native exprs + JVM HashingTF), fit
(treeAggregate L-BFGS), score (map-only vector dot), evaluate (one
aggregated row to the driver).

Mirrors the pair-scorer LR lifecycle (operators/scoring.py M1/M2 —
reference 2_train_dedupe_models.py's learned-classifier role) at the
document level. No per-row Python anywhere: features are native
column expressions; HashingTF and LogisticRegression are JVM-side.

Scale notes: HashingTF is map-only (numFeatures-wide sparse vectors,
murmur3 on tokens). L-BFGS does one treeAggregate pass per iteration
over the (cached) training set — cache it before fit, release after.
Scoring broadcasts the coefficient vector implicitly (model transform
is a closure over a dense vector of numFeatures + n_signals floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions import text_analysis as TA

__all__ = [
    "SIGNAL_COLS",
    "doc_features",
    "train_quality_lr",
    "score_quality",
    "evaluate_quality",
]

SIGNAL_COLS = [
    "q_n_chars",
    "q_token_count",
    "q_stopword_ratio",
    "q_punct_ratio",
    "q_repetition_ratio",
]


def doc_features(
    df: DataFrame,
    text_col: str = "text",
    num_hash_features: int = 4096,
) -> DataFrame:
    """Append the native signal columns, the token array, and the
    assembled ``features`` vector (signals + hashed bag-of-tokens).
    NULL text rows are dropped (no quality evidence to featurize)."""
    from pyspark.ml.feature import HashingTF, VectorAssembler

    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    out = df.where(t.isNotNull() & (F.length(F.trim(t)) > 0)).withColumns(
        {
            "q_n_chars": F.length(t).cast("double"),
            "q_token_count": F.size(toks).cast("double"),
            "q_stopword_ratio": TA.stopword_ratio_expr(text_col),
            "q_punct_ratio": TA.punct_ratio_expr(text_col),
            "q_repetition_ratio": TA.repetition_ratio_expr(text_col),
            "q_tokens": F.transform(toks, F.lower),
        }
    )
    hasher = HashingTF(
        inputCol="q_tokens", outputCol="q_hashed", numFeatures=num_hash_features
    )
    out = hasher.transform(out)
    assembler = VectorAssembler(
        inputCols=SIGNAL_COLS + ["q_hashed"],
        outputCol="features",
        handleInvalid="keep",
    )
    return assembler.transform(out)


def train_quality_lr(
    featurized: DataFrame,
    label_col: str,
    max_iter: int = 50,
    reg_param: float = 1e-3,
):
    """Fit the quality LR on a featurized frame (``doc_features``
    output + an integer 0/1 ``label_col``). Caches the training
    projection for the L-BFGS passes and releases it after the fit.
    Fails fast when a class is missing — pyspark.ml would otherwise
    fit a degenerate model silently."""
    from pyspark.ml.classification import LogisticRegression

    train = featurized.select(
        F.col("features"), F.col(label_col).cast("double").alias("label")
    ).persist()
    try:
        classes = [r["label"] for r in train.select("label").distinct().collect()]
        if sorted(classes) != [0.0, 1.0]:
            raise ValueError(
                f"quality LR needs both classes 0 and 1 in {label_col!r}; "
                f"got {sorted(classes)}"
            )
        lr = LogisticRegression(
            maxIter=max_iter,
            regParam=reg_param,
            standardization=True,
            family="binomial",
        )
        return lr.fit(train)
    finally:
        train.unpersist()


def score_quality(model, featurized: DataFrame) -> DataFrame:
    """Append ``quality_prob`` = P(label=1 | doc) — map-only (the
    coefficient vector rides the closure)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(featurized)
    return scored.withColumn(
        "quality_prob",
        F.round(vector_to_array("probability")[1], 6),
    ).drop("rawPrediction", "probability", "prediction")


def evaluate_quality(model, featurized: DataFrame, label_col: str) -> dict:
    """One aggregated metrics row to the driver: areaUnderROC and
    accuracy at the 0.5 cut."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    scored = model.transform(
        featurized.select(
            "features", F.col(label_col).cast("double").alias("label")
        )
    )
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction", labelCol="label"
    ).evaluate(scored)
    agg = scored.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double")).alias(
            "acc"
        ),
        F.count("*").cast("long").alias("n"),
    ).collect()[0]
    return {"auc": float(auc), "accuracy": float(agg["acc"]), "n": int(agg["n"])}
