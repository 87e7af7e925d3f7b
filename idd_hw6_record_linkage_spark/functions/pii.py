"""PII scrubbing for web-corpus text: emails, IPv4 addresses, and
long digit runs (phone-number-shaped), replaced with typed placeholder
tokens. A standard pre-training curation pass the reference's
record-level pipeline does not cover.

All three patterns are chosen for Java-regex (Spark) / RE2 (DuckDB)
parity so the contract oracle is value-exact:
- only ASCII classes ([A-Za-z0-9...], [0-9]) — no \\w/\\d/\\s, whose
  definitions differ between engines (see text_analysis.BPE notes);
- no backreferences or lookaround (RE2 has neither);
- greedy quantifiers only (identical leftmost-longest outcomes for
  these patterns under both engines' leftmost semantics).

Replacement order matters and is fixed: emails first (their local
part may contain digit runs), then IPv4 (dotted digits would
otherwise be partially eaten by the phone rule), then phone-shaped
digit runs. Native regexp_replace end to end — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

__all__ = [
    "EMAIL_RE",
    "IPV4_RE",
    "PHONE_RE",
    "redact_pii_expr",
    "pii_counts_exprs",
]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
# \b anchors exist in both Java regex and RE2 with the same ASCII
# word-boundary meaning for digit/dot contexts.
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# 9+ digits, optionally '+'-prefixed, with single space/dash/dot
# separators between digits — long enough to never fire on years,
# prices, or section numbers.
PHONE_RE = r"\+?[0-9]([ .-]?[0-9]){8,}"

_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def redact_pii_expr(col: str | Column) -> Column:
    """Text with every email / IPv4 / phone-shaped digit run replaced
    by its placeholder token, applied in the fixed order above."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, token in _RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts_exprs(col: str | Column) -> dict[str, Column]:
    """Match counts per category, computed on the SAME intermediate
    the redaction chain sees (emails counted on raw text, IPs on
    email-redacted text, phones on email+IP-redacted text) so counts
    and redactions always agree."""
    cur = F.col(col) if isinstance(col, str) else col
    counts: dict[str, Column] = {}
    for (pat, token), name in zip(_RULES, ["n_emails", "n_ips", "n_phones"]):
        # idx=0 (whole match) explicitly: Spark's SQL default is group
        # 1, which throws under ANSI for the group-free patterns.
        counts[name] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0))
        ).cast("long")
        cur = F.regexp_replace(cur, pat, token)
    return counts
