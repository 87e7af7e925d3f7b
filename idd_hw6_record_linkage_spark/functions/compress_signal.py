"""Compression-ratio quality signal: deflate(text) / len(text).

Machine-generated and template-spam pages are low-entropy — they
compress far better than natural prose, so a low ratio is a strong
junk indicator that survives token-level obfuscation (the signal the
Gopher/C4 rule set lacks). zlib is stdlib, so this is the one quality
signal that genuinely needs Python: it runs as an Arrow-batched
``pandas_udf`` (one Python call per record batch, never per row),
the only acceptable Python shape in this engine (SURVEY §2.10).

No DuckDB oracle exists (no SQL zlib); the contract gate is the
tripwire pattern: deterministic repetitive-vs-natural injection must
order the class means correctly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.column import Column
from pyspark.sql.types import DoubleType

__all__ = ["compression_ratio_udf", "compression_ratio"]


@F.pandas_udf(DoubleType())
def compression_ratio_udf(text: pd.Series) -> pd.Series:
    """deflate-compressed size over raw utf-8 size, per document.
    NULL text → NULL; empty text → 1.0 (nothing to compress). Level 6
    (zlib default): the ranking between natural and repetitive text is
    stable across levels, so the cheap default wins."""
    import zlib

    def one(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return 1.0
        return len(zlib.compress(raw, 6)) / len(raw)

    return text.map(one)


def compression_ratio(col: str | Column) -> Column:
    """Column wrapper, rounded to 6 for stable comparisons."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(compression_ratio_udf(c), 6)
