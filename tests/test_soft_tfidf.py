"""Soft-TF-IDF comparator (functions/soft_tfidf.py): weight-builder
math vs hand computation, Spark expression vs scalar replica,
edge semantics, identity-scores-one property."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _replica_inner(x: str, y: str) -> float:
    m = max(len(x), len(y))
    if m == 0:
        return 1.0
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        for j, cy in enumerate(y, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy))
            )
        prev = cur
    return 1.0 - prev[-1] / m


class TestDocTokenWeights:
    def test_weights_match_hand_computation(self, spark):
        from idd_hw6_record_linkage_spark.functions.soft_tfidf import (
            doc_token_weights,
        )

        docs = spark.createDataFrame(
            [
                (1, ["john", "smith", "smith"]),
                (2, ["jon", "smith"]),
                (3, ["alice", "wong"]),
            ],
            ["doc_id", "toks"],
        )
        w = {
            r.doc_id: {d["tok"]: d["w"] for d in r.wtoks}
            for r in doc_token_weights(docs, n_docs=3).collect()
        }
        # doc 1: tf(john)=1, tf(smith)=2; df(john)=1, df(smith)=2, N=3
        v_john = math.log(2.0) * math.log(3.0 / 1.0)
        v_smith = math.log(3.0) * math.log(3.0 / 2.0)
        norm = math.sqrt(v_john**2 + v_smith**2)
        assert abs(w[1]["john"] - v_john / norm) < 1e-12
        assert abs(w[1]["smith"] - v_smith / norm) < 1e-12
        # L2 normalization: every doc's weight vector has unit norm
        for d in w.values():
            assert abs(sum(x * x for x in d.values()) - 1.0) < 1e-9

    def test_sorted_by_token(self, spark):
        from idd_hw6_record_linkage_spark.functions.soft_tfidf import (
            doc_token_weights,
        )

        docs = spark.createDataFrame(
            [(1, ["zeta", "alpha", "mid"])], ["doc_id", "toks"]
        )
        row = doc_token_weights(docs, n_docs=1).collect()[0]
        assert [d["tok"] for d in row.wtoks] == ["alpha", "mid", "zeta"]


class TestSoftTfidf:
    def _spark_scores(self, spark, docs_rows, threshold):
        from idd_hw6_record_linkage_spark.functions.soft_tfidf import (
            doc_token_weights,
            soft_tfidf,
        )

        docs = spark.createDataFrame(docs_rows, ["doc_id", "toks"])
        w = doc_token_weights(docs, n_docs=len(docs_rows))
        l = w.select(  # noqa: E741
            F.col("doc_id").alias("id_l"), F.col("wtoks").alias("wa")
        )
        r = w.select(F.col("doc_id").alias("id_r"), F.col("wtoks").alias("wb"))
        out = (
            l.crossJoin(r)
            .where(F.col("id_l") < F.col("id_r"))
            .select(
                "id_l", "id_r", soft_tfidf("wa", "wb", threshold).alias("s")
            )
        )
        return {(x.id_l, x.id_r): x.s for x in out.collect()}, {
            x.doc_id: [(d["tok"], d["w"]) for d in x.wtoks]
            for x in w.collect()
        }

    def test_matches_scalar_replica(self, spark):
        from idd_hw6_record_linkage_spark.functions.soft_tfidf import (
            soft_tfidf_py,
        )

        rows = [
            (1, ["john", "smith"]),
            (2, ["jon", "smith"]),
            (3, ["alice", "wong"]),
            (4, ["smith", "smyth", "co"]),
        ]
        got, w = self._spark_scores(spark, rows, 0.8)
        for (a, b), s in got.items():
            exp = soft_tfidf_py(w[a], w[b], 0.8, inner=_replica_inner)
            assert abs(s - exp) < 1e-9, (a, b, s, exp)

    def test_identical_docs_score_one(self, spark):
        # needs a third doc so the shared tokens carry nonzero IDF —
        # in a corpus where a token appears in EVERY doc its idf is
        # ln(1)=0 and it contributes no evidence (by design).
        rows = [
            (1, ["acme", "corp", "intl"]),
            (2, ["acme", "corp", "intl"]),
            (3, ["zzz", "yyy"]),
        ]
        got, _ = self._spark_scores(spark, rows, 0.9)
        assert abs(got[(1, 2)] - 1.0) < 1e-9

    def test_disjoint_docs_score_zero(self, spark):
        rows = [(1, ["aaaa", "bbbb"]), (2, ["cccc", "dddd"])]
        got, _ = self._spark_scores(spark, rows, 0.8)
        assert got[(1, 2)] == 0.0

    def test_null_and_empty_arrays(self, spark):
        from idd_hw6_record_linkage_spark.functions.soft_tfidf import (
            soft_tfidf,
        )
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            StringType,
            StructField,
            StructType,
        )

        wt = ArrayType(
            StructType(
                [
                    StructField("tok", StringType()),
                    StructField("w", DoubleType()),
                ]
            )
        )
        schema = StructType(
            [StructField("wa", wt), StructField("wb", wt)]
        )
        rows = [
            (None, [("a", 1.0)]),
            ([], [("a", 1.0)]),
            ([("a", 1.0)], []),
        ]
        df = spark.createDataFrame(rows, schema).select(
            soft_tfidf("wa", "wb").alias("s")
        )
        got = [r.s for r in df.collect()]
        assert got[0] is None
        assert got[1] == 0.0 and got[2] == 0.0
