#!/usr/bin/env python
"""Round-9 A/B: ANN plan rewrites (similarity.py) old vs new, interleaved.

OLD arms below are verbatim copies of the round-8 implementations
(commit 5676688) of lsh_candidates/emb_lsh_ann, emb_ivf_ann's candidate
step, and emb_cosine_near_dup's banding; NEW arms call the round-9
module code. Parity is asserted exactly (sorted row tuples) before any
timing; timing is ABBA x ROUNDS with the noop sink, min + per-round
pairs reported as JSON.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_r09_ann.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import bench  # noqa: E402
from team_goldo_combat_log_parser_spark.operators import (  # noqa: E402
    similarity as S)
from team_goldo_combat_log_parser_spark.operators.relational import (  # noqa: E402
    load)
from team_goldo_combat_log_parser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))


# ------------------------------------------------------- round-8 (OLD) arms

@F.pandas_udf(T.ArrayType(T.IntegerType()))
def _band_keys_udf_old(emb: pd.Series) -> pd.Series:
    # identical math to the module UDF, WITHOUT the non-deterministic mark
    if len(emb) == 0:
        return pd.Series([], dtype=object)
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
    p = S._planes_matrix(m.shape[1])
    bits = (m @ p) > 0
    weights = 1 << np.arange(S.BAND_BITS)
    out = np.zeros((len(m), S.N_BANDS), dtype=np.int32)
    for b in range(S.N_BANDS):
        out[:, b] = bits[:, b * S.BAND_BITS:(b + 1) * S.BAND_BITS] @ weights
    return pd.Series(list(out))


def lsh_candidates_old(spark, sf_dir, probe_radius=1):
    e = load(spark, sf_dir, "embeddings")
    sig = e.withColumn("bkeys", _band_keys_udf_old("embedding"))
    banded = sig.select(
        "vec_id", "embedding",
        F.posexplode("bkeys").alias("band", "bkey"))
    q0 = banded.filter(F.col("vec_id") < S.N_QUERIES)
    probes = [F.col("bkey")]
    if probe_radius >= 1:
        probes += [F.col("bkey").bitwiseXOR(F.lit(1 << i))
                   for i in range(S.BAND_BITS)]
    q = q0.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), "band",
        F.explode(F.array(*probes)).alias("bkey"))
    return (
        q.join(banded.select("vec_id", "embedding", "band", "bkey"),
               ["band", "bkey"])
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "qv", "vec_id", "embedding")
        .distinct()
    )


def _rerank(cand):
    dot = F.aggregate(
        F.zip_with("qv", "embedding",
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    qn = F.sqrt(F.aggregate(
        F.transform("qv", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x))
    en = F.sqrt(F.aggregate(
        F.transform("embedding",
                    lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x))
    scored = cand.withColumn("cosine", dot / (qn * en))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= S.TOP_K)
        .select("qid", "rank", F.col("vec_id").alias("neighbor_id"),
                F.floor(F.col("cosine") * 1e6).alias("cosine_e6"))
        .orderBy("qid", "rank")
    )


def emb_lsh_ann_old(spark, sf_dir):
    return _rerank(lsh_candidates_old(spark, sf_dir))


def emb_ivf_ann_old(spark, sf_dir, nprobe=S.IVF_NPROBE):
    cents = S.ivf_model(spark, sf_dir)
    k_eff = cents.shape[0]
    nprobe = min(nprobe, k_eff)
    e = load(spark, sf_dir, "embeddings")

    # round-8 assign: no non-deterministic mark
    norms = np.linalg.norm(cents, axis=1)
    norms[norms == 0] = 1.0

    @F.pandas_udf(T.IntegerType())
    def assign_old(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0] = 1.0
        cos = (m @ cents.T) / np.outer(mn, norms)
        return pd.Series(np.argmax(cos, axis=1).astype("int32"))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells_old(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0] = 1.0
        cos = (m @ cents.T) / np.outer(mn, norms)
        order = np.lexsort((np.arange(cos.shape[1])[None, :]
                            .repeat(len(m), 0), -cos), axis=1)
        return pd.Series(list(order[:, :nprobe].astype("int32")))

    data = e.withColumn("cell", assign_old("embedding")).select(
        "vec_id", "embedding", "cell")
    q = (e.filter(F.col("vec_id") < S.N_QUERIES)
         .withColumn("cells", probe_cells_old("embedding"))
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv"),
                 F.explode("cells").alias("cell")))
    cand = (q.join(data, "cell")
            .filter(F.col("qid") != F.col("vec_id"))
            .select("qid", "qv", "vec_id", "embedding")
            .distinct())
    return _rerank(cand)


def emb_cosine_near_dup_old(spark, sf_dir, threshold=S.NEAR_DUP_THRESHOLD):
    e = load(spark, sf_dir, "embeddings")
    sig = e.withColumn("bkeys", _band_keys_udf_old("embedding"))
    banded = sig.select(
        "vec_id", F.posexplode("bkeys").alias("band", "bkey"))
    pairs = (
        banded.alias("x").join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    n = e.withColumn("norm2", S._norm_decimal("embedding"))
    ea = n.select(F.col("vec_id").alias("a"), F.col("embedding").alias("av"),
                  F.col("norm2").alias("an2"))
    eb = n.select(F.col("vec_id").alias("b"), F.col("embedding").alias("bv"),
                  F.col("norm2").alias("bn2"))
    dot_fast = F.aggregate(
        F.zip_with("av", "bv",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    dot = F.aggregate(
        F.zip_with("av", "bv",
                   lambda x, y: x.cast("decimal(18,9)")
                   * y.cast("decimal(18,9)")),
        F.lit(0).cast("decimal(38,18)"),
        lambda acc, x: (acc + x).cast("decimal(38,18)"))
    denom = (F.sqrt(F.col("an2").cast("double"))
             * F.sqrt(F.col("bn2").cast("double")))
    scored = (
        pairs.join(ea, "a").join(eb, "b")
        .filter(dot_fast / denom >= threshold - 1e-6)
        .withColumn("cosine", dot.cast("double") / denom)
        .filter(F.col("cosine") >= threshold)
    )
    return (scored.select("a", "b",
                          F.floor(F.col("cosine") * 1e6).alias("cosine_e6"))
            .orderBy("a", "b"))


ARMS = {
    "emb_lsh_ann": (emb_lsh_ann_old, S.emb_lsh_ann),
    "emb_ivf_ann": (emb_ivf_ann_old, S.emb_ivf_ann),
    "emb_cosine_near_dup": (emb_cosine_near_dup_old, S.emb_cosine_near_dup),
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    bench.request_hunter_stop()
    spark = get_spark("ab_r09_ann")
    out: dict[str, dict] = {}
    for name, (old, new) in ARMS.items():
        a = sorted(tuple(r) for r in old(spark, SF_DIR).collect())
        b = sorted(tuple(r) for r in new(spark, SF_DIR).collect())
        assert a == b, f"{name}: arm outputs differ ({len(a)} vs {len(b)})"
        rounds = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter(); noop(old(spark, SF_DIR))
            o1 = time.perf_counter() - t0
            t0 = time.perf_counter(); noop(new(spark, SF_DIR))
            n1 = time.perf_counter() - t0
            t0 = time.perf_counter(); noop(new(spark, SF_DIR))
            n2 = time.perf_counter() - t0
            t0 = time.perf_counter(); noop(old(spark, SF_DIR))
            o2 = time.perf_counter() - t0
            rounds.append([round(o1, 3), round(n1, 3),
                           round(n2, 3), round(o2, 3)])
        olds = [r[0] for r in rounds] + [r[3] for r in rounds]
        news = [r[1] for r in rounds] + [r[2] for r in rounds]
        out[name] = {"parity": "exact", "rows": len(a),
                     "old_min": min(olds), "new_min": min(news),
                     "ratio_min": round(min(news) / min(olds), 3),
                     "abba": rounds}
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
