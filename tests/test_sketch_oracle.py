"""Sketch-oracle gates.

1. golden/xxh.py is bit-for-bit Spark's xxhash64 (every tail path, longs,
   multi-column chaining) — the foundation the 4 sketch oracles stand on.
2. The oracle BUILDER is sf-generic: built at sf0.001 (not the driver's
   sf0.01 default), each oracle still matches the Spark query exactly.
   (The sf0.01 parity is covered by test_entry_oracles, same as the
   driver's gate.)
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from team_goldo_combat_log_parser_spark.golden import sketch_oracle
from team_goldo_combat_log_parser_spark.golden.xxh import (
    xxh64_long, xxh64_longs, xxh64_str)
from team_goldo_combat_log_parser_spark.operators import similarity, text


def test_xxh64_matches_spark_strings(spark):
    strs = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
            "abcdefgh", "abcdefghijk", "0123456789012345",
            *("x" * n for n in (17, 23, 31, 32, 33, 40, 63, 64, 65, 100, 160)),
            "spark graft sketch oracle", "key agg row scan"]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h"))
    got = {r["s"]: r["h"] for r in df.collect()}
    for s in strs:
        assert got[s] == xxh64_str(s), f"string {s!r}"


def test_xxh64_matches_spark_longs_and_chains(spark):
    longs = [0, 1, -1, 42, 2**31 - 1, -(2**63), 2**62, 987654321987654321]
    df = spark.createDataFrame([(v,) for v in longs], "v long").select(
        "v", F.xxhash64("v").alias("h"))
    got = {r["v"]: r["h"] for r in df.collect()}
    for v in longs:
        assert got[v] == xxh64_long(v), f"long {v}"
    chain = spark.range(1).select(
        F.xxhash64(F.lit(3).cast("long"), F.lit(-9).cast("long"),
                   F.lit(2**40).cast("long")).alias("h")).collect()[0]["h"]
    assert chain == xxh64_longs([3, -9, 2**40])


SKETCHES = {
    "doc_minhash_lsh_pairs": text.doc_minhash_lsh_pairs,
    "doc_simhash_near_pairs": text.doc_simhash_near_pairs,
    "doc_fingerprint": text.doc_fingerprint,
    "emb_lsh_ann": similarity.emb_lsh_ann,
}


@pytest.fixture(scope="module")
def ddb001(sf001):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf001}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", sorted(SKETCHES))
def test_sketch_oracle_sf_generic(spark, sf001, ddb001, name):
    sql = sketch_oracle.sketch_oracle_queries(sf001)[name]
    df = SKETCHES[name](spark, sf001)
    s_rows = sorted(tuple(r) for r in df.collect())
    rel = ddb001.sql(sql)
    assert sorted(df.columns) == sorted(rel.columns)
    d_rows = sorted(tuple(r) for r in rel.fetchall())
    assert len(s_rows) == len(d_rows), \
        f"{name}: spark={len(s_rows)} duckdb={len(d_rows)}"
    assert s_rows == d_rows, \
        f"{name}: first diff {next((a, b) for a, b in zip(s_rows, d_rows) if a != b)}"
