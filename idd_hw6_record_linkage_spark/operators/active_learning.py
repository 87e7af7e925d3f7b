"""Uncertainty-sampling active learning for the pair classifier —
the engine-native replacement for the reference's ``dedupe.RecordLink``
console-labeling loop (reference 2_train_dedupe_models.py:267-297:
``dedupe`` selects the pairs its current model is least certain about
and prompts a human). Here the same loop runs as DataFrame ops: score
the unlabeled pool with the current model, take the global top-B by
uncertainty ``|p − 0.5|``, ask the labeling oracle for JUST those B
pairs, refit, repeat. The oracle is any callable returning labels for
a pair DataFrame — a ground-truth table in tests, a human labeling
queue in production.

Scale shape (100 TB pool):
- pool scoring is map-only (assembler + LR transform — no shuffle);
- uncertainty selection is a global top-B via ``orderBy().limit(B)``
  = TakeOrderedAndProject (per-partition heaps + driver merge of
  B×partitions rows), never a full sort of the pool;
- the labeled set is bounded by the label budget (seed + rounds×B,
  i.e. tens to hundreds of rows), so carrying it driver-side and
  broadcasting it into the anti-join is exact and cheap — the POOL
  is never collected;
- each refit trains on ≤ budget rows: pyspark.ml LR cost is dominated
  by the pool scoring pass, not the fit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators.scoring import (
    ComparatorConfig,
    fit_logistic_regression,
    predict_probability,
)

__all__ = ["uncertainty_sample", "active_learn_lr"]


def uncertainty_sample(scored: DataFrame, batch_size: int) -> DataFrame:
    """The ``batch_size`` pairs the model is least certain about:
    smallest ``|score − 0.5|``, ties broken deterministically by pair
    id. TakeOrderedAndProject — never a global sort of the pool."""
    return (
        scored.withColumn("__u", F.abs(F.col("score") - F.lit(0.5)))
        .orderBy("__u", "id_l", "id_r")
        .limit(batch_size)
        .drop("__u")
    )


def active_learn_lr(
    features: DataFrame,
    oracle: Callable[[DataFrame], DataFrame],
    config: ComparatorConfig,
    seed_labels: DataFrame,
    rounds: int = 3,
    batch_size: int = 20,
):
    """Run the uncertainty-sampling loop; return
    ``(assembler, model, labeled, history)`` where ``labeled`` is the
    accumulated (id_l, id_r, label) DataFrame (size ≤ |seed| +
    rounds × batch_size) and ``history`` lists per-round label counts.

    ``features``: the unlabeled candidate-pair pool with comparator
    feature columns (output of ``compute_features*``). ``oracle``:
    called with a (id_l, id_r) DataFrame of at most ``batch_size``
    rows per round; must return those pairs with a ``label`` column
    (pairs it cannot label may be omitted — they count against the
    budget but not the training set, exactly like a human skipping).
    ``seed_labels``: the bootstrap labels (id_l, id_r, label) — the
    loop needs at least one example of each class to fit the first
    model; the reference seeds the same way (console-labeling starts
    from dedupe's random sample).
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = features.sparkSession
    lab_schema = StructType(
        [
            StructField("id_l", features.schema["id_l"].dataType),
            StructField("id_r", features.schema["id_r"].dataType),
            StructField("label", IntegerType()),
        ]
    )
    # The labeled set is budget-bounded (tens of rows) — carried as
    # driver-side rows so each round's anti-join broadcasts a tiny
    # literal table instead of growing a union lineage ``rounds`` deep.
    labeled_rows = [
        (r["id_l"], r["id_r"], int(r["label"]))
        for r in seed_labels.select("id_l", "id_r", "label").collect()
    ]
    if not {lab for _, _, lab in labeled_rows} >= {0, 1}:
        raise ValueError(
            "active_learn_lr: seed_labels must contain both classes "
            "(got only "
            f"{sorted({lab for _, _, lab in labeled_rows})})"
        )
    history: list[dict] = []
    assembler = model = None
    for _ in range(max(1, rounds)):
        labeled = spark.createDataFrame(
            labeled_rows, lab_schema
        )
        assembler, model = fit_logistic_regression(
            features, labeled, config
        )
        scored = predict_probability(features, assembler, model)
        pool = scored.join(
            F.broadcast(labeled.select("id_l", "id_r")),
            ["id_l", "id_r"],
            "left_anti",
        )
        picked = uncertainty_sample(pool, batch_size).select("id_l", "id_r")
        new = oracle(picked).select("id_l", "id_r", "label").collect()
        history.append(
            {"n_labeled": len(labeled_rows), "n_new": len(new)}
        )
        if not new:
            break  # pool exhausted or oracle done — converged
        labeled_rows.extend(
            (r["id_l"], r["id_r"], int(r["label"])) for r in new
        )
    labeled = spark.createDataFrame(
        labeled_rows, lab_schema
    )
    assembler, model = fit_logistic_regression(features, labeled, config)
    return assembler, model, labeled, history
