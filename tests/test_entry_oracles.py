"""Local mirror of the driver's correctness gate: for every queries() entry
with an oracle_sql(), run the Spark query and the DuckDB SQL on the same
parquet tables and compare row count + column names + exact values
(order-insensitive, columns sorted by name)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def canon(val):
    if val is None:
        return "<null>"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return repr(round(val, 9))
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    rel = ddb.sql(ORACLES[name])
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row counts differ " \
        f"(spark={len(s_rows)}, duckdb={len(d_rows)})"
    _, s_norm = normalize(s_cols, s_rows)
    _, d_norm = normalize(d_cols, d_rows)
    if s_norm != d_norm:
        diff = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_queries_have_oracle_or_reason():
    """Every queries() entry either has an oracle or is a documented
    rows-only op (combat_* / hash-sketch / approximate)."""
    rows_only_ok = {"combat_", "doc_minhash", "doc_simhash", "doc_fingerprint",
                    "emb_lsh_ann"}
    for name in QUERIES:
        if name in ORACLES:
            continue
        assert any(name.startswith(p) for p in rows_only_ok), \
            f"{name} lacks an oracle and isn't a known rows-only op"


def test_registry_within_driver_cap():
    """The round-7 INVARIANT as code (round-8 advice — it was
    documentation-only): the driver's correctness check takes the FIRST
    50 queries() entries in dict order, so entry 51 would silently push
    an existing operator out of the per-round rows+schema+hash window.
    Adding an operator means merging a near-duplicate demo into an
    absorbing query (see __spark_entry__ docstring), not growing past
    the cap."""
    assert len(QUERIES) <= 50, (
        f"queries() has {len(QUERIES)} entries — the driver only checks "
        "the first 50; merge demos instead of exceeding the cap")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_damage" in df.columns
