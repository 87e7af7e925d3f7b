"""End-to-end linkage pipeline over the pages table.

Stage DAG (one declarative DataFrame plan per stage; parquet stage
boundaries double as resumable checkpoints, SURVEY §3.1):

    read pages → normalize → {block_b1, block_b2, block_lsh}
      → pairs (salted equi-join ∪ passes, dedup)
      → score (feature matrix + weighted scorer)
      → edges (threshold w/ 0.5→0.3 fallback)
      → cluster (large-star/small-star CC)
      → eval (P/R/F1 vs labeled pairs / expected clusters)

The reference runs the same lifecycle eagerly in pandas
(record_linkage.py:588-693); every stage here is relational and
shuffle-partitioned, with explicit skew controls on blocking keys.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.cleaning import clean_text_expr
from idd_hw6_record_linkage_spark.functions.normalize import (
    title_tokens_expr,
    url_domain_expr,
)
from idd_hw6_record_linkage_spark.operators import blocking
from idd_hw6_record_linkage_spark.operators.clustering import clusters_from_edges
from idd_hw6_record_linkage_spark.operators.minhash import lsh_key_table
from idd_hw6_record_linkage_spark.operators import scoring
from idd_hw6_record_linkage_spark.operators.evaluation import (
    PRF1,
    pairwise_cluster_f1,
    precision_recall_f1,
)
from idd_hw6_record_linkage_spark.plans import metrics as M


@dataclass
class PipelineConfig:
    workdir: str
    run_id: str = "run0"
    comparator_config: scoring.ComparatorConfig = field(
        default_factory=lambda: scoring.WEB_P1
    )
    use_b1: bool = True  # domain key (brand analogue)
    use_b2: bool = True  # domain + title-prefix key (brand+model analogue)
    use_lsh: bool = True
    # "rule": fixed weighted-mean scorer (default). "lr": train a
    # pyspark.ml LogisticRegression on labeled pairs per run — the
    # reference's flagship lifecycle (record_linkage.py:461-505 fits LR
    # on the comparator features each run); requires a labeled_pairs
    # DataFrame (url_l, url_r, label) passed to run()/run_in_memory.
    scorer: str = "rule"
    lsh_bands: int = 8
    lsh_rows: int = 4
    max_block_size: int = 200
    score_threshold: float = 0.5
    fallback_threshold: float = 0.3
    resume: bool = False
    # Stage-boundary table format. "parquet" (default) writes
    # workdir/<stage>; "iceberg" writes catalog tables
    # <iceberg_namespace>.<run_id>_<stage> via writeTo — requires the
    # iceberg-spark runtime jar + a configured catalog (north rule
    # names Iceberg; this container has no jar, so the flag fails fast
    # with a clear message instead of a Py4J stack).
    table_format: str = "parquet"
    iceberg_namespace: str = "linkage"
    # Collapse re-crawls (same canonical url, differing tracking
    # params / case / fragments / crawl time) to the latest crawl
    # BEFORE normalize — the url-identity dedup stage a Common-Crawl
    # corpus needs ahead of content blocking. Off by default: the
    # reference has no such stage, and the per-url byte-identical
    # text invariant is defined over raw urls.
    collapse_recrawls: bool = False
    # Strip boilerplate lines (lines occurring in >= this many
    # distinct pages) from `text` BEFORE normalize — the CCNet/C4
    # corpus-hygiene stage ahead of content blocking, so nav bars and
    # cookie banners stop gluing unrelated pages into blocks. None
    # (default) = off: the reference has no such stage and its
    # byte-identical clean_text invariant is defined over raw text.
    strip_boilerplate_min_docs: int | None = None
    # Survivorship: per-column merge rules (operators/survivorship.py)
    # applied AFTER clustering to emit one golden record per entity
    # under result["golden"]. Keys are normalized-record columns (url,
    # warc_ts, lang, domain, title_norm, text_clean, n_chars, ...).
    # None (default) = off: the reference stops at cluster assignments.
    golden_rules: dict | None = None


def _maybe_collapse(pages: DataFrame, cfg: "PipelineConfig") -> DataFrame:
    if not cfg.collapse_recrawls:
        return pages
    from idd_hw6_record_linkage_spark.operators.dedup import (
        collapse_recrawls as _collapse,
    )

    # Keep the raw url as the record id (one survivor per canonical
    # url): the per-url invariants downstream stay byte-exact.
    return _collapse(pages, "url", "warc_ts").drop(
        "url_canonical", "n_versions"
    )


def _maybe_strip_boilerplate(
    pages: DataFrame, cfg: "PipelineConfig"
) -> DataFrame:
    if cfg.strip_boilerplate_min_docs is None:
        return pages
    from idd_hw6_record_linkage_spark.operators.line_dedup import (
        remove_boilerplate_lines,
    )

    cleaned = remove_boilerplate_lines(
        pages,
        "url",
        "text",
        min_docs=cfg.strip_boilerplate_min_docs,
    ).select("url", F.col("clean_text"))
    # Replace text, keep every other pages column untouched. LEFT join
    # + coalesce so no page can ever vanish from the pipeline through
    # this stage (remove_boilerplate_lines emits one row per input doc
    # including NULL-text docs, but the strip must be row-preserving
    # by construction, not by trusting the operator's cardinality).
    return (
        pages.join(cleaned, "url", "left")
        .withColumn("text", F.coalesce("clean_text", "text"))
        .drop("clean_text")
    )


def _pre_stages(pages: DataFrame, cfg: "PipelineConfig") -> DataFrame:
    return _maybe_strip_boilerplate(_maybe_collapse(pages, cfg), cfg)


def _maybe_golden(
    records: DataFrame, clusters: DataFrame, cfg: "PipelineConfig"
) -> DataFrame | None:
    """Survivorship stage: one golden record per entity, or None when
    cfg.golden_rules is unset. Joins the cluster assignment back to the
    normalized records on url (hash join on the record id — both sides
    corpus-sized, neither broadcast)."""
    if not cfg.golden_rules:
        return None
    from idd_hw6_record_linkage_spark.operators.survivorship import (
        consolidate_clusters,
    )

    members = clusters.join(records, "url")
    return consolidate_clusters(members, "entity_id", cfg.golden_rules)


def normalize_plan(pages: DataFrame) -> DataFrame:
    """Mediated web-record schema (SURVEY §1.3 role mapping): domain←
    brand, sorted-title←model, clean text←description. Pure expression
    plan — no materialization."""
    title = F.regexp_extract(
        F.col("html").cast("string"), r"<title>(.*?)</title>", 1
    )
    toks = title_tokens_expr(title)
    # Empty title/text are *missing* for comparators (reference declares
    # every field has_missing=True, 2_train_dedupe_models.py:56-88;
    # missing → similarity 0). text_clean stays byte-exact ('' included)
    # — the per-url invariant column.
    return (
        pages.select(
            "url",
            "warc_ts",
            "lang",
            url_domain_expr("url").alias("domain"),
            F.nullif(F.concat_ws(" ", toks), F.lit("")).alias("title_norm"),
            clean_text_expr("text").alias("text_clean"),
        )
        .withColumn("n_chars", F.length("text_clean"))
        .withColumn("text_cmp", F.nullif(F.col("text_clean"), F.lit("")))
        # pre-tokenized distinct tokens, HASHED to int64: comparators
        # over pairs consume this array so tokenization happens once
        # per record, not once per candidate pair (NULL when text
        # empty → missing semantics). Hashing matters at scale: the
        # pair join ships both sides' token arrays through the
        # shuffle, and 8-byte longs move ~3x fewer bytes than token
        # strings — set Jaccard is hash-invariant (distinct-token
        # collisions are ~n²/2⁻⁶⁴, i.e. never).
        .withColumn(
            "text_tokens",
            F.when(
                F.col("text_cmp").isNotNull(),
                F.array_distinct(
                    F.transform(
                        F.split(F.col("text_cmp"), " "),
                        lambda t: F.xxhash64(t),
                    )
                ),
            ),
        )
    )


def block_keys_plan(records: DataFrame, cfg: "PipelineConfig",
                    extra_cols: list[str] | None = None) -> DataFrame:
    # Content-derived salt basis for the block-size cap: duplicate
    # records share a title/text prefix, so when a mega-domain block is
    # split into sub-blocks, true pairs stay co-located (id-based salt
    # would scatter them — recall loss inside oversized blocks).
    # ``extra_cols``: passthrough record columns (streaming incremental
    # path — event time + new-side attributes ride the key table so no
    # stream-stream join is ever needed).
    salt_basis = F.coalesce(
        F.substring("title_norm", 1, 12),
        F.substring("text_clean", 1, 24),
        F.col("url"),
    )
    passes: list[DataFrame] = []
    if cfg.use_b1:
        # B1 analogue: coarse key = normalized domain (brand role).
        passes.append(
            blocking.key_table(records, "url", F.col("domain"), "b1",
                               salt_basis, extra_cols=extra_cols)
        )
    if cfg.use_b2:
        # B2 analogue: domain + 2-char prefix of the token-sorted title
        # (brand + model-prefix role, blocking_B2.py:70-87).
        key = F.when(
            F.col("domain").isNotNull() & (F.length("title_norm") >= 2),
            F.concat_ws(
                "_",
                F.col("domain"),
                F.substring(
                    F.regexp_replace("title_norm", r"[^a-z0-9]", ""), 1, 2
                ),
            ),
        )
        passes.append(blocking.key_table(records, "url", key, "b2",
                                         salt_basis, extra_cols=extra_cols))
    if cfg.use_lsh:
        passes.append(
            lsh_key_table(
                records, "url", "text_clean",
                num_bands=cfg.lsh_bands, rows_per_band=cfg.lsh_rows,
                salt_basis=salt_basis, extra_cols=extra_cols,
            )
        )
    keys = passes[0]
    for p in passes[1:]:
        keys = keys.unionByName(p)
    return keys


def _validate_scorer(cfg: "PipelineConfig",
                     labeled_pairs: DataFrame | None) -> None:
    """Fail fast on scorer misconfiguration BEFORE any stage persists:
    raising after persist() registrations would leak CacheManager
    entries with no release handle (the error path nobody unpersists)."""
    if cfg.scorer not in ("rule", "lr"):
        raise ValueError(f"unknown scorer: {cfg.scorer!r}")
    if cfg.scorer == "lr" and labeled_pairs is None:
        raise ValueError(
            "scorer='lr' requires labeled_pairs (url_l, url_r, label)"
        )


def _scored_features(feats: DataFrame, cfg: "PipelineConfig",
                     labeled_pairs: DataFrame | None) -> DataFrame:
    """Apply the configured scorer to a feature matrix: the rule
    scorer's weighted mean, or a per-run LogisticRegression fit on
    labeled pairs (M1/M2) — identical downstream threshold-with-
    fallback semantics either way."""
    _validate_scorer(cfg, labeled_pairs)
    if cfg.scorer == "lr":
        labels = labeled_pairs.select(
            F.col("url_l").alias("id_l"),
            F.col("url_r").alias("id_r"),
            "label",
        )
        assembler, model = scoring.fit_logistic_regression(
            feats, labels, cfg.comparator_config
        )
        return scoring.predict_probability(feats, assembler, model)
    return scoring.score(feats, cfg.comparator_config)


def run_in_memory(spark: SparkSession, pages: DataFrame,
                  cfg: "PipelineConfig | None" = None,
                  labeled_pairs: DataFrame | None = None) -> dict:
    """Compose the full linkage DAG lazily (no parquet stage
    boundaries) — for small inputs, smoke checks, and plan inspection."""
    cfg = cfg or PipelineConfig(workdir="/tmp/_unused", run_id="mem")
    _validate_scorer(cfg, labeled_pairs)
    # Persist the fan-out points: records feeds key-gen + both sides of
    # the feature joins; keys feeds the size-count and both sides of the
    # self-join (projection differences defeat ReuseExchange there).
    records = normalize_plan(_pre_stages(pages, cfg)).persist()
    raw_keys = block_keys_plan(records, cfg).persist()
    keys = blocking.cap_blocks(
        raw_keys, cfg.max_block_size, salt_col="salt_basis"
    ).persist()
    pairs = blocking.candidate_pairs_self(keys).persist()
    feats = scoring.compute_features(pairs, records, cfg.comparator_config, "url")
    # persist: threshold_with_fallback's existence probe executes the
    # scoring plan once; without the persist, clusters/consumers would
    # re-run the whole Arrow-UDF scoring pass a second time.
    scored = _scored_features(feats, cfg, labeled_pairs).persist()
    edges, _ = scoring.threshold_with_fallback(
        scored, cfg.score_threshold, cfg.fallback_threshold
    )
    clusters = clusters_from_edges(
        edges.select("id_l", "id_r"), records.select("url"), id_col="url"
    )
    # The persisted stages are intentionally session-scoped (the caller
    # keeps using records/pairs/scored); "release" unpersists them all
    # once the caller is done — long-lived sessions running many
    # pipelines should call it to avoid cache accumulation.
    handles = [records, raw_keys, keys, pairs, scored]
    result = {
        "records": records,
        "pairs": pairs,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
        "release": lambda: [h.unpersist() for h in handles],
    }
    golden = _maybe_golden(records, clusters, cfg)
    if golden is not None:
        result["golden"] = golden
    return result


def link_sources(
    spark: SparkSession,
    pages_l: DataFrame,
    pages_r: DataFrame,
    cfg: "PipelineConfig | None" = None,
    labeled_pairs: DataFrame | None = None,
) -> dict:
    """Two-source record linkage — the reference's primary lifecycle
    (record_linkage.py:588-693: Craigslist × US Used Cars): blocking
    keys per source, cross-source candidate equi-join, feature scoring,
    threshold-with-fallback. Output is matched PAIRS (the reference
    emits pairs, not clusters, for two-source linkage:
    record_linkage.py:528-536)."""
    cfg = cfg or PipelineConfig(workdir="/tmp/_unused", run_id="link")
    _validate_scorer(cfg, labeled_pairs)
    rec_l = normalize_plan(_pre_stages(pages_l, cfg)).persist()
    rec_r = normalize_plan(_pre_stages(pages_r, cfg)).persist()
    # ONE oversized-block list over the union of both sources: capping
    # each side independently would salt hot keys on one side only and
    # silently drop their cross-source candidates.
    keys_l, keys_r = blocking.cap_blocks_pair(
        block_keys_plan(rec_l, cfg),
        block_keys_plan(rec_r, cfg),
        cfg.max_block_size,
        salt_col="salt_basis",
    )
    keys_l = keys_l.persist()
    keys_r = keys_r.persist()
    pairs = blocking.candidate_pairs_cross(keys_l, keys_r).persist()
    feats = scoring.compute_features_two(
        pairs, rec_l, rec_r, cfg.comparator_config, "url"
    )
    # persist: the threshold probe executes the scoring plan; without it
    # the matches consumer re-runs the Arrow scoring pass a second time.
    scored = _scored_features(feats, cfg, labeled_pairs).persist()
    matches, used = scoring.threshold_with_fallback(
        scored, cfg.score_threshold, cfg.fallback_threshold
    )
    handles = [rec_l, rec_r, keys_l, keys_r, pairs, scored]
    return {
        "records_l": rec_l,
        "records_r": rec_r,
        "pairs": pairs,
        "scored": scored,
        "matches": matches,
        "threshold_used": used,
        "release": lambda: [h.unpersist() for h in handles],
    }


class StagedPlan:
    """Shared stage plumbing for resumable, metrics-tracked pipelines:
    each stage materializes to the configured table format exactly once
    per run_id (resume skips completed stages via the metrics table's
    completion rows) and appends per-partition lineage. ``cfg`` must
    carry workdir / run_id / resume / table_format / iceberg_namespace;
    LinkagePipeline (ER) and plans.corpus_pipeline.CorpusPipeline (LLM
    corpus hygiene) both build on this."""

    def __init__(self, spark: SparkSession, cfg) -> None:
        self.spark = spark
        self.cfg = cfg
        os.makedirs(cfg.workdir, exist_ok=True)

    # --- stage plumbing ------------------------------------------------

    def _stage_path(self, stage: str) -> str:
        if self.cfg.table_format == "iceberg":
            return f"{self.cfg.iceberg_namespace}.{self.cfg.run_id}_{stage}"
        return os.path.join(self.cfg.workdir, stage)

    def _write_stage(self, df: DataFrame, target: str) -> None:
        if self.cfg.table_format == "parquet":
            df.write.mode("overwrite").parquet(target)
        elif self.cfg.table_format == "iceberg":
            from idd_hw6_record_linkage_spark.sources.pages import iceberg_available

            if not iceberg_available(self.spark):
                raise RuntimeError(
                    "table_format='iceberg' needs the iceberg-spark runtime "
                    "jar + a catalog; submit with --packages org.apache."
                    "iceberg:iceberg-spark-runtime-4.0_2.13:<ver> or use "
                    "table_format='parquet'"
                )
            df.writeTo(target).createOrReplace()
        else:
            raise ValueError(f"unknown table_format: {self.cfg.table_format}")

    def _read_stage(self, target: str) -> DataFrame:
        if self.cfg.table_format == "iceberg":
            return self.spark.read.format("iceberg").load(target)
        return self.spark.read.parquet(target)

    def _run_stage(self, stage: str, build, rows_in: int | None = None,
                   pair_count: int | None = None, match_count: int | None = None,
                   ) -> DataFrame:
        """Materialize a stage to the configured table format unless
        already completed for this run_id (resume)."""
        path = self._stage_path(stage)
        if self.cfg.resume and M.stage_completed(
            self.spark, self.cfg.workdir, self.cfg.run_id, stage
        ):
            return self._read_stage(path)
        df = build()
        self._write_stage(df, path)
        out = self._read_stage(path)
        M.append_stage_metrics(
            self.spark, self.cfg.workdir, self.cfg.run_id, stage, out,
            rows_in=rows_in, pair_count=pair_count, match_count=match_count,
        )
        return out


class LinkagePipeline(StagedPlan):
    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        super().__init__(spark, cfg)

    # --- stages ---------------------------------------------------------

    def normalize(self, pages: DataFrame) -> DataFrame:
        return self._run_stage(
            "normalize",
            lambda: normalize_plan(_pre_stages(pages, self.cfg)),
        )

    def pairs(self, records: DataFrame) -> DataFrame:
        def build():
            # skew control: deterministic sub-blocking of oversized keys.
            # Persist both fan-out points: raw keys feed the oversize
            # count + the cap join; capped keys feed both sides of the
            # candidate self-join.
            raw = block_keys_plan(records, self.cfg).persist()
            keys = blocking.cap_blocks(
                raw, self.cfg.max_block_size, salt_col="salt_basis"
            ).persist()
            # blocking quality metrics, like the reference's per-run
            # blocking logs (blocking_B1.py:92-127): stats per pass
            # land in the metrics table alongside lineage rows.
            stats = blocking.block_size_stats(keys).collect()[0]
            M.append_stage_metrics(
                self.spark, self.cfg.workdir, self.cfg.run_id, "block_stats",
                None,
                rows_in=int(stats["records_in_blocks"]),
                pair_count=int(stats["candidate_pairs"]),
            )
            return blocking.candidate_pairs_self(keys)

        return self._run_stage("pairs", build)

    def score(self, records: DataFrame, pairs: DataFrame,
              labeled_pairs: DataFrame | None = None) -> DataFrame:
        def build():
            feats = scoring.compute_features(
                pairs, records, self.cfg.comparator_config, id_col="url"
            )
            return _scored_features(feats, self.cfg, labeled_pairs)

        return self._run_stage("score", build)

    def edges(self, scored: DataFrame) -> DataFrame:
        def build():
            edges, _used = scoring.threshold_with_fallback(
                scored, self.cfg.score_threshold, self.cfg.fallback_threshold
            )
            return edges.select("id_l", "id_r", "score")

        n_pairs = scored.count()
        out = self._run_stage("edges", build, pair_count=n_pairs)
        return out

    def cluster(self, records: DataFrame, edges: DataFrame) -> DataFrame:
        def build():
            return clusters_from_edges(edges, records.select("url"), id_col="url")

        return self._run_stage("cluster", build)

    # --- end-to-end ------------------------------------------------------

    def run(
        self,
        pages: DataFrame,
        labeled_pairs: DataFrame | None = None,
        expected_clusters: DataFrame | None = None,
    ) -> dict:
        records = self.normalize(pages)
        pairs = self.pairs(records)
        scored = self.score(records, pairs, labeled_pairs)
        edges = self.edges(scored)
        clusters = self.cluster(records, edges)

        result: dict = {
            "records": records,
            "pairs": pairs,
            "scored": scored,
            "edges": edges,
            "clusters": clusters,
        }
        golden = _maybe_golden(records, clusters, self.cfg)
        if golden is not None:
            result["golden"] = golden
        if labeled_pairs is not None:
            truth_pos = labeled_pairs.where(F.col("label") == 1).select(
                F.col("url_l").alias("id_l"), F.col("url_r").alias("id_r")
            )
            result["edge_prf1"] = precision_recall_f1(
                edges.select("id_l", "id_r"), truth_pos
            )
            result["pairs_completeness"] = blocking.pairs_completeness(
                pairs, truth_pos
            )
        if expected_clusters is not None:
            result["cluster_prf1"] = pairwise_cluster_f1(clusters, expected_clusters)
        return result


def dedupe_pages(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    labeled_pairs: DataFrame | None = None,
    **cfg_kwargs,
) -> dict:
    """One-call flagship API: pages table in → clusters + metrics out.
    Pass ``scorer="lr"`` + ``labeled_pairs`` for the reference's
    train-LR-per-run lifecycle instead of the rule scorer."""
    cfg = PipelineConfig(workdir=workdir, **cfg_kwargs)
    return LinkagePipeline(spark, cfg).run(pages, labeled_pairs=labeled_pairs)
