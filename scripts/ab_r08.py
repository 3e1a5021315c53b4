#!/usr/bin/env python
"""Round-8 paired A/Bs (VERDICT r7 next #4/#5), CACHE_AB-style: ABBA
ordering inside each round, CPU canaries bracketing every arm, medians
over per-round ratios so linear host drift cancels. One Spark session —
these A/Bs compare QUERY BODIES, not session-level defaults, so a
shared JVM is the controlled setting (same codegen cache, same
shuffle service), unlike bench_ab_cache's fresh-process protocol.

  enrich   — the merged broadcast_enrich_revenue (with the absorbed
             collect_set_sorted aggregates) vs the pre-merge body
             (revenue + n_items only): attributes the r7 1.33->2.14s
             shift to the absorbed work or finds a regression.
  ivf      — emb_ivf_ann serve (model pre-trained + memoized) at the
             legacy fixed K=16 vs the derived K=ivf_k_for(n): prices
             the documented K shift on the bench corpus.
  minhash  — doc_minhash_lsh_pairs with exploded vs scan_local
             signature construction (round-8 speedup candidate).

Output: JSON lines per round + a markdown table appended to
BENCH/MINHASH_AB.md / BENCH/ENRICH_IVF_AB.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from team_goldo_combat_log_parser_spark.operators import (  # noqa: E402
    similarity, text)
from team_goldo_combat_log_parser_spark.operators.relational import (  # noqa: E402
    _dec, load)
from team_goldo_combat_log_parser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("SPARK_GRAFT_AB_PAIRS", "4"))


def enrich_premerge(spark, sf_dir):
    """broadcast_enrich_revenue as it was BEFORE absorbing
    collect_set_sorted (r6 body: revenue + n_items only)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                     - _dec("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "n_name")
    )


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def run_pairs(name: str, arm_a, arm_b, pairs: int) -> dict:
    """ABBA within each round; canary before and after each round."""
    rounds = []
    for i in range(pairs):
        c_pre = bench.canary_mips()
        if i % 2 == 0:
            a1, b1, b2, a2 = (timed(arm_a), timed(arm_b),
                              timed(arm_b), timed(arm_a))
        else:
            b1, a1, a2, b2 = (timed(arm_b), timed(arm_a),
                              timed(arm_a), timed(arm_b))
        c_post = bench.canary_mips()
        a, b = min(a1, a2), min(b1, b2)
        gated = (min(c_pre, c_post)
                 >= bench.GATE_FRAC * bench.gate_floor())
        rec = {"round": i, "a_sec": a, "b_sec": b,
               "ratio_b_over_a": round(b / a, 4),
               "canary_pre": c_pre, "canary_post": c_post,
               "gated": gated,
               "raw": {"a": [a1, a2], "b": [b1, b2]}}
        rounds.append(rec)
        print(json.dumps({"ab": name, **rec}), flush=True)
    gated_rounds = [r for r in rounds if r["gated"]] or rounds
    med = statistics.median(r["ratio_b_over_a"] for r in gated_rounds)
    return {"name": name, "rounds": rounds,
            "median_ratio_b_over_a": round(med, 4),
            "gated_rounds": len([r for r in rounds if r["gated"]]),
            "a_best": min(r["a_sec"] for r in rounds),
            "b_best": min(r["b_sec"] for r in rounds)}


def main() -> None:
    which = set(sys.argv[1:]) or {"enrich", "ivf", "minhash"}
    bench.request_hunter_stop()
    spark = get_spark("ab_r08", cores=bench.CPUS)
    results = []

    if "enrich" in which:
        full = lambda: bench.QUERY_BENCHES["broadcast_enrich_revenue"](  # noqa: E731
            spark, SF_DIR).collect()
        pre = lambda: enrich_premerge(spark, SF_DIR).collect()  # noqa: E731
        pre()
        full()  # warm
        results.append(run_pairs("enrich_full_vs_premerge",
                                 pre, full, PAIRS))

    if "ivf" in which:
        n = (load(spark, SF_DIR, "embeddings")
             .select("vec_id").count())
        kd = similarity.ivf_k_for(n)
        similarity._ivf_model_cache.clear()
        similarity.emb_ivf_ann(spark, SF_DIR, k=16).collect()      # train 16
        similarity.emb_ivf_ann(spark, SF_DIR).collect()            # train kd
        fixed = lambda: similarity.emb_ivf_ann(  # noqa: E731
            spark, SF_DIR, k=16).collect()
        derived = lambda: similarity.emb_ivf_ann(  # noqa: E731
            spark, SF_DIR).collect()
        res = run_pairs(f"ivf_serve_k16_vs_k{kd}", fixed, derived, PAIRS)
        res["n_vectors"], res["derived_k"] = n, kd
        results.append(res)

    if "minhash" in which:
        exp = lambda: text.doc_minhash_lsh_pairs(  # noqa: E731
            spark, SF_DIR, mode="exploded").collect()
        loc = lambda: text.doc_minhash_lsh_pairs(  # noqa: E731
            spark, SF_DIR, mode="scan_local").collect()
        exp()
        loc()  # warm
        results.append(run_pairs("minhash_exploded_vs_scan_local",
                                 exp, loc, PAIRS))

    print(json.dumps({"summary": results}, indent=None), flush=True)


if __name__ == "__main__":
    main()
