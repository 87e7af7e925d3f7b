"""S4: Ditto pair-serialization sink.

The reference exports labeled candidate pairs as tab-separated text
for its DistilBERT matcher arm (scripts/ditto/1_prepare_data.py:
235-271, extract_pair_representation at :44-71):

    <repr_left> \\t <repr_right> \\t <label>

where each side's representation is the space-join of its field
values with NaN→'', str.strip(), tab/newline/CR→space, and empty
values dropped. Implemented as pure column expressions ending in a
``write.text`` — one distributed pass, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scrub(col: Column) -> Column:
    """NaN→'', strip, control-separator scrub — byte-parity with the
    reference's per-value cleanup (1_prepare_data.py:60-68)."""
    s = F.trim(col.cast("string"))
    s = F.regexp_replace(s, r"[\t\n\r]", " ")
    return F.coalesce(s, F.lit(""))


def record_repr_expr(field_cols: list[Column | str]) -> Column:
    """Space-join of the scrubbed field values, empties dropped
    (`" ".join(filter(None, values))`, 1_prepare_data.py:71)."""
    vals = [
        F.nullif(_scrub(F.col(c) if isinstance(c, str) else c), F.lit(""))
        for c in field_cols
    ]
    return F.concat_ws(" ", *vals)


def ditto_lines(
    pairs: DataFrame,
    fields_l: list[Column | str],
    fields_r: list[Column | str],
    label_col: Column | str = "label",
) -> DataFrame:
    """One `value: string` column in Ditto format, ready for
    ``.write.text(path)`` (or show/collect in tests)."""
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    return pairs.select(
        F.concat_ws(
            "\t",
            record_repr_expr(fields_l),
            record_repr_expr(fields_r),
            label.cast("int").cast("string"),
        ).alias("value")
    )


def write_ditto(
    pairs: DataFrame,
    path: str,
    fields_l: list[Column | str],
    fields_r: list[Column | str],
    label_col: Column | str = "label",
    coalesce: int | None = None,
) -> None:
    """Write the Ditto train/val/test text files. ``coalesce=1``
    reproduces the reference's single-file layout for small exports;
    leave None at scale (one file per partition)."""
    out = ditto_lines(pairs, fields_l, fields_r, label_col)
    if coalesce:
        out = out.coalesce(coalesce)
    out.write.mode("overwrite").text(path)
