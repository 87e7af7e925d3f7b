"""Dataset splitting + preflight data-contract checks (SURVEY §2.8 O6/
O7, §5.1).

Reference: split_dataset.py:29-43 (70/15/15, seed 42) and
1_preflight_checks.py:25-89 (required columns, non-empty, duplicate-id
info, null info, train/val/test pair-overlap guard). Failures raise
PreflightError; informational findings come back as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PreflightError(RuntimeError):
    pass


def split_70_15_15(
    df: DataFrame, seed: int = 42
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """O6: random 70/15/15 split, seed-pinned (split_dataset.py:29-43)."""
    train, val, test = df.randomSplit([0.7, 0.15, 0.15], seed=seed)
    return train, val, test


def check_required_columns(df: DataFrame, cols: list[str], name: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise PreflightError(f"[{name}] missing columns: {missing}")


def check_non_empty(df: DataFrame, name: str) -> None:
    if df.limit(1).count() == 0:
        raise PreflightError(f"[{name}] is empty")


def duplicate_id_info(df: DataFrame, id_col: str, name: str) -> str | None:
    """Info-level (duplicates are expected in record linkage)."""
    n_dup = (
        df.groupBy(id_col)
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    if n_dup:
        return f"[{name}] info: {n_dup} duplicate values in {id_col}"
    return None


def null_info(df: DataFrame, cols: list[str], name: str) -> str | None:
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).collect()[0]
    bad = {c: int(row[c]) for c in cols if row[c]}
    if bad:
        return f"[{name}] info: null counts in key columns: {bad}"
    return None


def check_pair_overlap(
    train: DataFrame, others: dict[str, DataFrame], key_cols: list[str]
) -> None:
    """O7 (1_preflight_checks.py:56-62): the same labeled pair must not
    appear in two splits — inner join on the pair key must be empty."""
    t = train.select(*key_cols).dropDuplicates(key_cols)
    for name, df in others.items():
        n = (
            df.select(*key_cols)
            .dropDuplicates(key_cols)
            .join(t, key_cols, "inner")
            .count()
        )
        if n:
            raise PreflightError(f"Train/{name} overlap detected: {n} pairs re-used")


def run_preflight(
    train: DataFrame,
    val: DataFrame,
    test: DataFrame,
    required_cols: list[str],
    id_cols: list[str],
    null_check_cols: list[str],
    pair_key_cols: list[str],
) -> list[str]:
    """Full contract suite; returns info strings, raises on violations."""
    infos: list[str] = []
    for name, df in [("train", train), ("validation", val), ("test", test)]:
        check_required_columns(df, required_cols, name)
        check_non_empty(df, name)
        for idc in id_cols:
            msg = duplicate_id_info(df, idc, name)
            if msg:
                infos.append(msg)
        msg = null_info(df, null_check_cols, name)
        if msg:
            infos.append(msg)
    check_pair_overlap(train, {"validation": val, "test": test}, pair_key_cols)
    return infos
