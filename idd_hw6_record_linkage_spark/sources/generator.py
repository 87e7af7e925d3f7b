"""Deterministic synthetic web-pages generator (FIXTURES.md §1-3).

Generates the Common-Crawl-style ``pages`` table with planted
ground-truth duplicate clusters, the ``labeled_pairs`` truth table and
the ``expected_clusters`` oracle. Seed-pinned per entity id, generated
distributively with ``mapInPandas`` over ``spark.range`` — the output
is identical for any partitioning / parallelism level (required for
the two-parallelism scaling benchmark to compare like with like).

Duplicate planting mirrors the perturbations the reference pipeline
must be robust to (SURVEY §5 / FIXTURES.md):
- token shuffles in the title (B2 token-sorted key invariant),
- prefix-preserving word edits in the body (Jaro-Winkler / Levenshtein
  thresholds, record_linkage.py:280-295),
- length jitter within the Gaussian-similarity scale
  (record_linkage.py:292-295),
- emoji / control-char / symbol noise that clean_text must remove
  byte-identically (clean_VIN_desc.py:5-18),
- hard negatives: same domain (shared B1 block) but different entity
  (cf. 2b_train_with_manual_blocking.py:208-251).

~5% of domains are "mega-domains" holding ~50% of pages → hot-key skew
for the salting tests (web-scale analogue of the reference's 69-record
`chevrolet_si` block, output/blocking/blocking_B2_test_log.txt).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.schema import PAGES_SCHEMA

SEED = 42

_BASE_WORDS = """page content article section heading paragraph listing offer product detail
review summary report update notice bulletin story feature column post entry
guide manual tutorial reference index archive catalog record profile account
market price value trade deal sale auction stock share fund bond asset
engine model series edition version release build variant spec chassis frame
travel route city region country place venue event schedule season ticket
science method result sample study theory signal system energy matter
network server client packet socket thread process memory buffer cache""".split()

# Expand deterministically to ~2.8k distinct words so two *unrelated*
# documents share few tokens (keeps cross-entity Jaccard low — true
# negatives must stay below the match threshold).
_WORDS = np.array(
    _BASE_WORDS
    + [f"{w}{suf}" for w in _BASE_WORDS for suf in ("ist", "ory", "ine", "al")]
    + [f"{pre}{w}" for w in _BASE_WORDS[:40] for pre in ("un", "re", "pre")]
)

_NOISE = ["★", "➤", "\U0001f600", "\U0001f680", "éü", "\t", "\n", "  ", "—"]
_LANGS = np.array(["en", "en", "en", "en", "en", "en", "it", "de"])

# Generation knobs (deterministic given SEED + entity id).
_MAX_CLUSTER = 5


def _domain_pool(n_domains: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (domains, sampling probabilities): 5% mega-domains carry
    ~50% of the mass."""
    rng = np.random.RandomState(SEED)
    domains = np.array([f"site{i:05d}.example.com" for i in range(n_domains)])
    n_mega = max(1, n_domains // 20)
    probs = np.full(n_domains, 0.5 / max(1, n_domains - n_mega))
    probs[:n_mega] = 0.5 / n_mega
    probs = probs / probs.sum()
    rng.shuffle(domains)  # decouple mega-ness from name order
    return domains, probs


def _entity_batch(pdf_iter: Iterator[pd.DataFrame], n_domains: int) -> Iterator[pd.DataFrame]:
    domains, probs = _domain_pool(n_domains)
    cum = np.cumsum(probs)
    for pdf in pdf_iter:
        rows: list[dict] = []
        for eid in pdf["id"].tolist():
            rng = np.random.RandomState((SEED * 1_000_003 + int(eid)) % (2**32))
            domain = domains[int(np.searchsorted(cum, rng.rand()))]
            csize = 1 + int(rng.rand() * _MAX_CLUSTER) if rng.rand() < 0.6 else 1
            title_tokens = rng.choice(_WORDS, size=4 + rng.randint(4), replace=False)
            base_words = rng.choice(_WORDS, size=40 + rng.randint(40), replace=True)
            lang = str(rng.choice(_LANGS))
            ts = 1_500_000_000 + int(eid) * 97 % 200_000_000
            for m in range(csize):
                mrng = np.random.RandomState(
                    (SEED * 2_000_003 + int(eid) * 31 + m) % (2**32)
                )
                toks = title_tokens.copy()
                mrng.shuffle(toks)  # token shuffle — sorted key invariant
                words = base_words.copy()
                # perturb <5% of words → levenshtein sim stays >0.9
                n_edit = max(0, int(len(words) * 0.04 * mrng.rand()))
                for _ in range(n_edit):
                    words[mrng.randint(len(words))] = str(mrng.choice(_WORDS))
                # length jitter within gauss scale: append a few words
                extra = mrng.choice(_WORDS, size=mrng.randint(4), replace=True)
                body = " ".join(np.concatenate([words, extra]))
                title = " ".join(toks)
                # plant noise clean_text must strip
                noisy = body
                for _ in range(mrng.randint(6)):
                    pos = mrng.randint(max(1, len(noisy)))
                    noisy = noisy[:pos] + str(mrng.choice(_NOISE)) + noisy[pos:]
                url = f"https://{domain}/e{int(eid):010d}/m{m}"
                html = (
                    "<html><title>" + title + "</title><body>" + noisy + "</body></html>"
                ).encode("utf-8", "ignore")
                rows.append(
                    {
                        "url": url,
                        "warc_ts": pd.Timestamp(ts + m * 3600, unit="s"),
                        "html": html,
                        "text": noisy,
                        "lang": lang,
                        "entity_id": int(eid),
                        "member": m,
                        "domain": domain,
                    }
                )
        yield pd.DataFrame(rows)


_GEN_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "entity_id long, member int, domain string"
)


def generate_raw(spark: SparkSession, n_entities: int, n_domains: int | None = None,
                 partitions: int | None = None) -> DataFrame:
    """Pages + provenance columns (entity_id/member/domain kept for
    truth derivation; dropped for the public pages table)."""
    if n_domains is None:
        n_domains = max(20, n_entities // 40)
    if partitions is None:
        partitions = max(8, min(64, n_entities // 500 or 8))
    base = spark.range(0, n_entities, 1, partitions)
    return base.mapInPandas(
        lambda it: _entity_batch(it, n_domains), schema=_GEN_SCHEMA
    )


def generate_pages(spark: SparkSession, n_entities: int, **kw) -> DataFrame:
    """The public pages table — exactly the input_hint schema
    (PAGES_SCHEMA column order; types fixed by _GEN_SCHEMA)."""
    raw = generate_raw(spark, n_entities, **kw)
    return raw.select(*[f.name for f in PAGES_SCHEMA.fields])


def expected_clusters(raw: DataFrame) -> DataFrame:
    """Oracle: entity_id := min url within the planted cluster."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("entity_id")
    return (
        raw.select("url", "entity_id")
        .withColumn("canon", F.min("url").over(w))
        .select("url", F.col("canon").alias("entity_id"))
    )


def labeled_pairs(raw: DataFrame, negatives_per_positive: float = 1.0) -> DataFrame:
    """Truth pairs: all within-entity member pairs label=1; hard
    negatives = same-domain cross-entity pairs, label=0, seed-pinned
    sample (2_train_dedupe_models.py:171-199 analogue)."""
    left = raw.select(
        F.col("url").alias("url_l"), F.col("entity_id").alias("e_l"),
        F.col("domain").alias("d_l"),
    )
    right = raw.select(
        F.col("url").alias("url_r"), F.col("entity_id").alias("e_r"),
        F.col("domain").alias("d_r"),
    )
    within = (
        left.join(right, (F.col("e_l") == F.col("e_r")) & (F.col("url_l") < F.col("url_r")))
        .select("url_l", "url_r", F.lit(1).alias("label"))
    )
    # hard negatives share the domain (same B1 block) but differ in entity
    neg = (
        left.join(
            right,
            (F.col("d_l") == F.col("d_r"))
            & (F.col("e_l") < F.col("e_r"))
            & (F.col("url_l") < F.col("url_r")),
        )
        # deterministic pseudo-random thinning: keep a hash slice
        .where(F.pmod(F.xxhash64("url_l", "url_r"), F.lit(97)) < F.lit(8))
        .select("url_l", "url_r", F.lit(0).alias("label"))
    )
    n_pos = within.count()
    n_neg = neg.count()
    if n_neg > 0:
        frac = min(1.0, negatives_per_positive * n_pos / n_neg)
        neg = neg.sample(withReplacement=False, fraction=frac, seed=SEED)
    return within.unionByName(neg)
