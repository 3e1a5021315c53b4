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
    "emb_ivf_ann": similarity.emb_ivf_ann,
    "emb_cosine_near_dup": similarity.emb_cosine_near_dup,
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


def _write_docs(spark, path: str, rows: list[tuple[int, str, str, str]]):
    """documents-shaped SINGLE-FILE parquet (the testdata layout — both
    the oracle builder and DuckDB read it as one file, not a Spark dir)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([("doc_id", pa.int32()), ("source", pa.string()),
                        ("lang", pa.string()), ("text", pa.string())])
    cols = list(zip(*rows)) if rows else [[], [], [], []]
    pq.write_table(pa.table(dict(zip(schema.names, cols)), schema=schema),
                   f"{path}/documents.parquet")


def _write_embs(spark, path: str, rows: list[tuple[int, str, list[float]]]):
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([("vec_id", pa.int32()), ("label", pa.string()),
                        ("embedding", pa.list_(pa.float32()))])
    cols = list(zip(*rows)) if rows else [[], [], []]
    pq.write_table(pa.table(dict(zip(schema.names, cols)), schema=schema),
                   f"{path}/embeddings.parquet")


def test_sketch_oracle_valid_for_empty_input(spark, tmp_path):
    """ADVICE gate: zero-row inputs must yield well-formed SQL (typed empty
    relation), not a malformed zero-tuple VALUES — mirroring the media
    oracle's any-n hardening."""
    d = str(tmp_path)
    _write_docs(spark, d, [])
    _write_embs(spark, d, [])
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    for name, sql in sketch_oracle.sketch_oracle_queries(d).items():
        rel = con.sql(sql)  # must parse and run
        assert rel.fetchall() == [], name


def test_sketch_oracle_fails_loud_on_scale_mismatch(spark, sf001, tmp_path):
    """If the hash tables (built from the oracle sf dir) and the registered
    documents view diverge, the LEFT-join error() guard must raise instead
    of silently dropping unmatched shingles/tokens."""
    sqls = sketch_oracle.sketch_oracle_queries(sf001)
    d = str(tmp_path)
    _write_docs(spark, d, [(1, "s1", "en",
                            "\u00d8\u03a9\u00a4" * 5)])  # 3/8-grams + token absent from sf0.001
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    for name in ("doc_minhash_lsh_pairs", "doc_simhash_near_pairs",
                 "doc_fingerprint"):
        with pytest.raises(duckdb.Error, match="missing from hash table"):
            con.sql(sqls[name]).fetchall()


def test_simhash_oracle_ascii_whitespace_parity(spark, tmp_path):
    """A U+00A0 (Unicode space, NOT ASCII \\s) inside a document must
    tokenize identically in the Python hash-table builder and in both
    engines — two identical such docs must surface as a hamming-0 pair."""
    d = str(tmp_path)
    txt = "alpha\u00a0beta gamma delta epsilon zeta"
    _write_docs(spark, d, [(1, "s1", "en", txt), (2, "s1", "en", txt)])
    sql = sketch_oracle.simhash_sql(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    d_rows = con.sql(sql).fetchall()
    s_rows = [tuple(r) for r in text.doc_simhash_near_pairs(
        spark, d).collect()]
    assert s_rows == [(1, 2, 0)]
    assert sorted(d_rows) == sorted(s_rows)
