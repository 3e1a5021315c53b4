#!/usr/bin/env python
"""Round-8 simhash early-filter A/B (same protocol as scripts/ab_r08.py):
doc_simhash_near_pairs with hamming filtered BEFORE the (a, b) dedup
exchange (new) vs the former distinct-then-filter body (old), ABBA
pairs in one session, CPU canaries bracketing each round."""

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

from team_goldo_combat_log_parser_spark.operators import text  # noqa: E402
from team_goldo_combat_log_parser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("SPARK_GRAFT_AB_PAIRS", "4"))
MAX_HAMMING = 6


def simhash_old(spark, sf_dir):
    """The pre-round-8 body: dedup ALL candidate pairs, then filter."""
    sh = text.doc_simhash64(spark, sf_dir).localCheckpoint(eager=True)
    ckeys = [F.shiftright("simhash", c * 8).bitwiseAND(F.lit(0xFF))
             for c in range(8)]
    blocked = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*ckeys)).alias("chunk", "ckey"))
    return (
        blocked.alias("x").join(
            blocked.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.ckey") == F.col("y.ckey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"),
                F.col("x.simhash").alias("ha"), F.col("y.simhash").alias("hb"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= MAX_HAMMING)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    )


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    # match the ab_r08.py protocol: ask a running scaling hunter to stand
    # down so background load cannot contaminate the timed arms despite
    # canary bracketing (round-8 advice, low)
    import bench
    bench.request_hunter_stop()
    spark = get_spark("ab_simhash_r08")
    new = lambda: text.doc_simhash_near_pairs(spark, SF_DIR).count()  # noqa: E731
    old = lambda: simhash_old(spark, SF_DIR).count()  # noqa: E731

    # parity first: identical rows both ways
    a = text.doc_simhash_near_pairs(spark, SF_DIR)
    b = simhash_old(spark, SF_DIR)
    n_sym = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert n_sym == 0, f"arm outputs differ: {n_sym} asymmetric rows"
    print(json.dumps({"parity": "exact", "rows": a.count()}))

    new(); old()  # warm JIT both bodies
    rounds = []
    for i in range(PAIRS):
        c0 = bench.canary_mips()
        if i % 2 == 0:
            n1, o1, o2, n2 = timed(new), timed(old), timed(old), timed(new)
        else:
            o1, n1, n2, o2 = timed(old), timed(new), timed(new), timed(old)
        c1 = bench.canary_mips()
        r = {"round": i, "new": round(min(n1, n2), 3),
             "old": round(min(o1, o2), 3),
             "ratio_old_over_new": round(min(o1, o2) / min(n1, n2), 3),
             "canaries": [round(c0, 1), round(c1, 1)]}
        rounds.append(r)
        print(json.dumps(r), flush=True)
    med = statistics.median(r["ratio_old_over_new"] for r in rounds)
    print(json.dumps({"median_ratio_old_over_new": round(med, 3),
                      "new_best": min(r["new"] for r in rounds),
                      "old_best": min(r["old"] for r in rounds)}))
    spark.stop()


if __name__ == "__main__":
    main()
