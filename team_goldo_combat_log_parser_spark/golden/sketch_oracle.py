"""DuckDB oracles for the hash-sketch queries (MinHash-LSH, SimHash,
fingerprint, hyperplane-LSH ANN) — closing the last rows-only gap in the
driver's correctness gate.

The sketches hinge on Spark's ``xxhash64``, which DuckDB lacks, so each
oracle substitutes golden/xxh.py (an independent pure-Python XXH64) for
exactly the hash step and re-derives everything else as independently as
the op allows:

* ``doc_minhash_lsh_pairs`` / ``doc_simhash_near_pairs`` /
  ``doc_fingerprint`` — STRONG second derivation: only the
  (value -> hash) mapping is tabulated as a VALUES relation; the whole
  downstream pipeline — shingling, affine permutations, per-permutation
  minima, banding, bit votes, chunk blocking, pair join, Hamming
  filter, smallest-4 winnowing — is plain DuckDB SQL over the
  driver-registered ``documents`` view. MinHash banding is compared on
  the 8-value band slice itself (tuple equality) rather than Spark's
  64-bit band hash — same semantics, independent formulation.
* ``emb_lsh_ann`` — sequential recomputation rendered as VALUES: the
  cosine re-rank needs Spark's exact left-fold double summation order,
  which SQL SUM does not guarantee, so banding/probing/ranking are
  re-derived in plain Python/numpy instead.

The documents/embeddings inputs are read at oracle-build time from
``SPARK_GRAFT_ORACLE_SF_DIR`` (default /root/testdata/sf0.01 — the scale
the driver's correctness harness runs at; tests/test_sketch_oracle.py
re-validates the builder at sf0.001 to prove it is not tied to one sf).
"""

from __future__ import annotations

import math
import os
import re
from collections import defaultdict

import duckdb
import numpy as np

from ..operators.similarity import (
    BAND_BITS, N_BANDS, N_QUERIES, TOP_K, _planes_matrix)
from ..operators.text import _AB, _P
from .xxh import xxh64_str

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _sf_dir(sf_dir: str | None) -> str:
    return sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                                    DEFAULT_SF_DIR)


def _docs(sf_dir: str) -> list[tuple[int, str, str]]:
    return duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values_rel(rows: list[str], cols: list[tuple[str, str]]) -> str:
    """Render a VALUES relation, or a typed empty relation when there are
    no rows — 'VALUES' with zero tuples is malformed SQL (the bug class
    media_oracle_queries was hardened against; same guard here)."""
    if rows:
        body = ",\n      ".join(rows)
        names = ", ".join(c for c, _ in cols)
        return f"SELECT * FROM (VALUES\n      {body}\n      ) v({names})"
    sel = ", ".join(f"CAST(NULL AS {t}) AS {c}" for c, t in cols)
    return f"SELECT {sel} WHERE false"


def _shingle_set(text: str, n: int) -> set[str]:
    """Mirror of operators.text._shingles: substring(text, i, n) for
    i in 1..greatest(len-(n-1), 1), distinct."""
    return {text[i:i + n] for i in range(max(len(text) - (n - 1), 1))}


# --------------------------------------------------------------- MinHash

def minhash_sql(sf_dir: str | None = None) -> str:
    """Hash-table VALUES + full SQL re-derivation of the banded LSH join."""
    sf_dir = _sf_dir(sf_dir)
    shingles = sorted({sh for _, _, text in _docs(sf_dir)
                       for sh in _shingle_set(text, 3)})
    sh_rows = [
        f"({_q(sh)}, CAST({xxh64_str(sh) & 0x7FFFFFFF} AS BIGINT))"
        for sh in shingles]
    perm_rows = ",\n      ".join(
        f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for i, (a, b) in enumerate(_AB))
    return f"""
    WITH sh_hash AS (
      {_values_rel(sh_rows, [("sh", "VARCHAR"), ("h", "BIGINT")])}
    ), perm AS (
      SELECT * FROM (VALUES
      {perm_rows}
      ) v(pi, a, b)
    ), idx AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i
      FROM documents
    ), doc_sh AS (
      SELECT DISTINCT doc_id, substring(text, i, 3) AS s FROM idx
    ), hs AS (
      SELECT d.doc_id, v.h FROM doc_sh d JOIN sh_hash v ON d.s = v.sh
    ), missing AS (
      -- fail-loud scale guard: the hash table is built from
      -- SPARK_GRAFT_ORACLE_SF_DIR while `documents` is the harness view;
      -- any shingle the table lacks surfaces through the UNION ALL error
      -- branch below instead of being silently dropped by the inner join
      -- (an inline CASE error() inside hs can be optimized away when the
      -- final result is empty — the union branch always evaluates).
      SELECT d.s FROM doc_sh d LEFT JOIN sh_hash v ON d.s = v.sh
      WHERE v.h IS NULL
    ), mins AS (
      SELECT doc_id, p.pi, MIN((h * p.a + p.b) % {_P}) AS mh
      FROM hs CROSS JOIN perm p GROUP BY 1, 2
    ), sig AS (
      SELECT doc_id, list(mh ORDER BY pi) AS mhs FROM mins GROUP BY doc_id
    ), bands AS (
      SELECT unnest(generate_series(0, 3)) AS band
    ), banded AS (
      SELECT doc_id, band,
             list_slice(mhs, band * 8 + 1, band * 8 + 8) AS bslice
      FROM sig CROSS JOIN bands
    ), cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.bslice = y.bslice AND x.doc_id < y.doc_id
    )
    SELECT c.a, c.b,
           ROUND(CAST(SUM(CASE WHEN xa.mh = xb.mh THEN 1 ELSE 0 END)
                      AS DOUBLE) / 32, 6) AS est_jaccard
    FROM cand c
    JOIN mins xa ON xa.doc_id = c.a
    JOIN mins xb ON xb.doc_id = c.b AND xb.pi = xa.pi
    GROUP BY c.a, c.b
    UNION ALL
    SELECT CAST(error('sketch oracle: shingle missing from hash table '
                      || '(sf mismatch?): ' || s) AS INTEGER),
           NULL, NULL
    FROM missing
    ORDER BY a, b
    """


# --------------------------------------------------------------- SimHash

def simhash_sql(sf_dir: str | None = None) -> str:
    """Token-hash VALUES + full SQL re-derivation: bit votes, sign vector,
    8-bit chunk blocking, Hamming filter."""
    sf_dir = _sf_dir(sf_dir)
    # ASCII whitespace class + strip(' '), NOT \s+/.strip(): Python \s and
    # str.strip() are Unicode-aware, while both engines (Java regex, RE2)
    # treat \s as ASCII and trim() strips spaces only — a U+00A0 in a doc
    # must tokenize identically here and in the engines, or the join below
    # would drop its votes.
    tokens = sorted({tok for _, _, text in _docs(sf_dir)
                     for tok in re.split("[ \t\n\r\f\x0b]+", text.strip(" "))})
    tok_rows = [
        f"({_q(t)}, CAST({xxh64_str(t)} AS BIGINT))" for t in tokens]
    return f"""
    WITH tok_hash AS (
      {_values_rel(tok_rows, [("tok", "VARCHAR"), ("h", "BIGINT")])}
    ), toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ), bits AS (
      SELECT unnest(generate_series(0, 62)) AS i
    ), toks_h AS (
      SELECT t.doc_id, v.h
      FROM toks t JOIN tok_hash v ON t.tok = v.tok
    ), missing AS (
      -- fail-loud scale guard (see minhash_sql): surfaced by the UNION
      -- ALL error branch in the final SELECT
      SELECT t.tok FROM toks t LEFT JOIN tok_hash v ON t.tok = v.tok
      WHERE v.h IS NULL
    ), votes AS (
      SELECT t.doc_id, b.i,
             SUM(CASE WHEN (t.h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM toks_h t CROSS JOIN bits b
      GROUP BY 1, 2
    ), sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY 1
    ), chunks AS (
      SELECT unnest(generate_series(0, 7)) AS c
    ), blocked AS (
      SELECT s.doc_id, s.simhash, ch.c,
             (s.simhash >> (ch.c * 8)) & 255 AS ckey
      FROM sim s CROSS JOIN chunks ch
    ), pairs AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                      x.simhash AS ha, y.simhash AS hb
      FROM blocked x JOIN blocked y
        ON x.c = y.c AND x.ckey = y.ckey AND x.doc_id < y.doc_id
    )
    SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM pairs WHERE bit_count(xor(ha, hb)) <= 6
    UNION ALL
    SELECT CAST(error('sketch oracle: token missing from hash table '
                      || '(sf mismatch?): ' || tok) AS INTEGER),
           NULL, NULL
    FROM missing
    ORDER BY a, b
    """


# ----------------------------------------------------------- fingerprint

def fingerprint_sql(sf_dir: str | None = None) -> str:
    """Hash-table VALUES + full SQL re-derivation: 8-gram shingling,
    smallest-4 selection ordered by (hash, shingle), ascending sort, and
    '|' join all happen in DuckDB over the documents view; only the
    (shingle -> xxhash64) mapping is tabulated."""
    sf_dir = _sf_dir(sf_dir)
    shingles = sorted({sh for _, _, text in _docs(sf_dir)
                       for sh in _shingle_set(text, 8)})
    sh_rows = [
        f"({_q(sh)}, CAST({xxh64_str(sh)} AS BIGINT))" for sh in shingles]
    return f"""
    WITH sh_hash AS (
      {_values_rel(sh_rows, [("sh", "VARCHAR"), ("h", "BIGINT")])}
    ), idx AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
      FROM documents
    ), doc_sh AS (
      SELECT DISTINCT doc_id, substring(text, i, 8) AS s FROM idx
    ), hs AS (
      SELECT d.doc_id, v.h, d.s FROM doc_sh d JOIN sh_hash v ON d.s = v.sh
    ), missing AS (
      -- fail-loud scale guard (see minhash_sql): surfaced by the UNION
      -- ALL error branch in the final SELECT
      SELECT d.s FROM doc_sh d LEFT JOIN sh_hash v ON d.s = v.sh
      WHERE v.h IS NULL
    ), ranked AS (
      SELECT doc_id, h,
             row_number() OVER (PARTITION BY doc_id ORDER BY h, s) AS rn
      FROM hs
    )
    SELECT doc_id,
           array_to_string(list(h ORDER BY h), '|') AS fingerprint
    FROM ranked WHERE rn <= 4 GROUP BY doc_id
    UNION ALL
    SELECT CAST(error('sketch oracle: 8-gram missing from hash table '
                      || '(sf mismatch?): ' || s) AS INTEGER),
           NULL
    FROM missing
    ORDER BY doc_id
    """


# ------------------------------------------------------------- LSH ANN

def lsh_ann_sql(sf_dir: str | None = None) -> str:
    """Sequential re-derivation of the hyperplane-LSH ANN: signatures via
    the same seeded planes matrix (the definition of the hash family),
    but banding, radius-1 multi-probe, candidate set, exact left-fold
    cosine re-rank, and top-k all re-done in plain Python — rendered as
    VALUES. Left-fold double sums reproduce Spark's F.aggregate order
    bit-for-bit (DuckDB's SUM may reorder, hence no SQL formulation)."""
    sf_dir = _sf_dir(sf_dir)
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = [r[0] for r in raw]
    if not ids:
        rel = _values_rel([], [("qid", "INTEGER"), ("rank", "INTEGER"),
                               ("neighbor_id", "INTEGER"),
                               ("cosine_e6", "BIGINT")])
        return f"SELECT * FROM ({rel}) t ORDER BY qid, rank"
    emb = {r[0]: r[1] for r in raw}
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in raw])
    planes = _planes_matrix(m.shape[1])
    bits = (m @ planes) > 0
    weights = 1 << np.arange(BAND_BITS)
    keys = np.zeros((len(ids), N_BANDS), dtype=np.int64)
    for b in range(N_BANDS):
        keys[:, b] = bits[:, b * BAND_BITS:(b + 1) * BAND_BITS] @ weights
    postings: dict[tuple[int, int], set[int]] = defaultdict(set)
    for i, vid in enumerate(ids):
        for b in range(N_BANDS):
            postings[(b, int(keys[i, b]))].add(vid)

    def fold_dot(xs, ys):
        acc = 0.0
        for x, y in zip(xs, ys):
            acc += float(x) * float(y)
        return acc

    rows = []
    for qi, qid in enumerate(ids):
        if qid >= N_QUERIES:
            continue
        cands: set[int] = set()
        for b in range(N_BANDS):
            k = int(keys[qi, b])
            for pk in [k] + [k ^ (1 << j) for j in range(BAND_BITS)]:
                cands |= postings.get((b, pk), set())
        cands.discard(qid)
        scored = []
        for cid in cands:
            qv, ev = emb[qid], emb[cid]
            cos = fold_dot(qv, ev) / (math.sqrt(fold_dot(qv, qv))
                                      * math.sqrt(fold_dot(ev, ev)))
            scored.append((cid, cos))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (cid, cos) in enumerate(scored[:TOP_K], 1):
            rows.append(f"({qid}, {rank}, {cid}, {math.floor(cos * 1e6)})")
    rel = _values_rel(rows, [("qid", "INTEGER"), ("rank", "INTEGER"),
                             ("neighbor_id", "INTEGER"),
                             ("cosine_e6", "BIGINT")])
    return f"SELECT * FROM ({rel}) t ORDER BY qid, rank"


def ivf_ann_sql(sf_dir: str | None = None) -> str:
    """Sequential re-derivation of the IVF ANN (declared, like
    lsh_ann_sql): vec_id-modulus training sample, position-stride
    seeding over the sorted sample ids (deduped — mirrors
    similarity._ivf_seed_ids), Lloyd rounds over the SAMPLE with
    vec_id-ordered left-fold cell sums (bit-identical to Spark's
    array_sort + F.aggregate double fold), cosine assignment of the full
    corpus against SUM centroids (scale-invariant — no division ever
    computed), nprobe probing, and the exact left-fold cosine re-rank —
    rendered as VALUES. K is derived from the corpus size with the same
    ivf_k_for the engine uses (round 7 — the sqrt(n) rule as code), so
    the two sides agree at any corpus scale."""
    from ..operators.similarity import (
        IVF_ITERS, IVF_NPROBE, N_QUERIES, TOP_K,
        _ivf_seed_ids, ivf_k_for, ivf_train_target)

    sf_dir = _sf_dir(sf_dir)
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = [r[0] for r in raw]
    cols = [("qid", "INTEGER"), ("rank", "INTEGER"),
            ("neighbor_id", "INTEGER"), ("cosine_e6", "BIGINT")]
    if not ids:
        return (f"SELECT * FROM ({_values_rel([], cols)}) t "
                "ORDER BY qid, rank")
    emb = {r[0]: [float(x) for x in r[1]] for r in raw}
    m = np.stack([np.asarray(emb[v], dtype=np.float64) for v in ids])
    dim = m.shape[1]
    mod = max(len(ids) // ivf_train_target(len(ids)), 1)
    tidx = [i for i in range(len(ids)) if ids[i] % mod == 0]
    if not tidx:
        # mirror similarity.ivf_train_centroids: an empty modulus sample
        # (gapped ids) falls back to the full corpus
        tidx = list(range(len(ids)))
    tids = [ids[i] for i in tidx]  # ascending (ids is sorted)
    seed_ids = _ivf_seed_ids(tids, ivf_k_for(len(ids)))
    cents = np.stack([m[ids.index(s)] for s in seed_ids])
    k_eff = cents.shape[0]

    def assign(c: np.ndarray, mm: np.ndarray) -> np.ndarray:
        norms = np.linalg.norm(c, axis=1)
        norms[norms == 0] = 1.0
        mn = np.linalg.norm(mm, axis=1)
        mn[mn == 0] = 1.0
        cos = (mm @ c.T) / np.outer(mn, norms)
        return np.argmax(cos, axis=1)

    tm = m[tidx]
    for _ in range(IVF_ITERS):
        tcells = assign(cents, tm)
        new = cents.copy()
        for c in range(k_eff):
            # tidx is vec_id-ascending, so iteration order == the
            # engine's array_sort(struct(vec_id, v)) left-fold order
            members = [j for j in range(len(tids)) if tcells[j] == c]
            if not members:
                continue
            for p in range(dim):
                s = 0.0
                for j in members:
                    s += float(tm[j, p])
                new[c, p] = s
        cents = new

    cells = assign(cents, m)
    cnorms = np.linalg.norm(cents, axis=1)
    cnorms[cnorms == 0] = 1.0
    nprobe = min(IVF_NPROBE, k_eff)

    def fold_dot(xs, ys):
        acc = 0.0
        for x, y in zip(xs, ys):
            acc += float(x) * float(y)
        return acc

    rows = []
    for qi, qid in enumerate(ids):
        if qid >= N_QUERIES:
            continue
        qn = np.linalg.norm(m[qi]) or 1.0
        qcos = (m[qi] @ cents.T) / (qn * cnorms)
        order = sorted(range(k_eff), key=lambda c: (-qcos[c], c))
        probe = set(order[:nprobe])
        cands = {ids[i] for i in range(len(ids))
                 if cells[i] in probe and ids[i] != qid}
        scored = []
        for cid in cands:
            qv, ev = emb[qid], emb[cid]
            cos = fold_dot(qv, ev) / (math.sqrt(fold_dot(qv, qv))
                                      * math.sqrt(fold_dot(ev, ev)))
            scored.append((cid, cos))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (cid, cos) in enumerate(scored[:TOP_K], 1):
            rows.append(f"({qid}, {rank}, {cid}, {math.floor(cos * 1e6)})")
    return (f"SELECT * FROM ({_values_rel(rows, cols)}) t "
            "ORDER BY qid, rank")


def cosine_near_dup_sql(sf_dir: str | None = None) -> str:
    """Candidate-pair VALUES (numpy re-derivation of the hyperplane
    banding — the hash-family definition) + FULL SQL re-derivation of
    the exact DECIMAL cosine and threshold filter over the harness
    `embeddings` view. Same split as minhash_sql: only the hash step is
    tabulated; every value the result carries is DuckDB arithmetic."""
    from ..operators.similarity import NEAR_DUP_THRESHOLD

    sf_dir = _sf_dir(sf_dir)
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = [r[0] for r in raw]
    if not ids:
        rel = _values_rel([], [("a", "INTEGER"), ("b", "INTEGER"),
                               ("cosine_e6", "BIGINT")])
        return f"SELECT * FROM ({rel}) t ORDER BY a, b"
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in raw])
    planes = _planes_matrix(m.shape[1])
    bits = (m @ planes) > 0
    weights = 1 << np.arange(BAND_BITS)
    pairs: set[tuple[int, int]] = set()
    for b in range(N_BANDS):
        keys = bits[:, b * BAND_BITS:(b + 1) * BAND_BITS] @ weights
        buckets: dict[int, list[int]] = defaultdict(list)
        for i, k in enumerate(keys):
            buckets[int(k)].append(i)
        for members in buckets.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    va, vb = ids[members[x]], ids[members[y]]
                    pairs.add((min(va, vb), max(va, vb)))
    rows = [f"({a}, {b})" for a, b in sorted(pairs)]
    cand_rel = _values_rel(rows, [("a", "INTEGER"), ("b", "INTEGER")])
    return f"""
    WITH cand AS (
      {cand_rel}
    ), n AS (
      SELECT vec_id, embedding,
             (SELECT SUM(CAST(x AS DECIMAL(18,9)) * CAST(x AS DECIMAL(18,9)))
              FROM (SELECT unnest(embedding) AS x) t) AS norm2
      FROM embeddings
    ), joined AS (
      -- LEFT joins + missing guard: an sf mismatch between the candidate
      -- table and the harness view must fail loudly (see minhash_sql)
      SELECT c.a, c.b, ea.embedding AS av, eb.embedding AS bv,
             ea.norm2 AS an2, eb.norm2 AS bn2
      FROM cand c
      LEFT JOIN n ea ON ea.vec_id = c.a
      LEFT JOIN n eb ON eb.vec_id = c.b
    ), missing AS (
      SELECT a AS vid FROM joined WHERE an2 IS NULL
      UNION ALL
      SELECT b FROM joined WHERE bn2 IS NULL
    ), scored AS (
      SELECT a, b,
             CAST((SELECT SUM(CAST(x AS DECIMAL(18,9))
                              * CAST(y AS DECIMAL(18,9)))
                   FROM (SELECT unnest(av) AS x, unnest(bv) AS y) t)
                  AS DOUBLE)
             / (sqrt(CAST(an2 AS DOUBLE)) * sqrt(CAST(bn2 AS DOUBLE)))
               AS cosine
      FROM joined WHERE an2 IS NOT NULL AND bn2 IS NOT NULL
    )
    SELECT a, b, CAST(FLOOR(cosine * 1e6) AS BIGINT) AS cosine_e6
    FROM scored WHERE cosine >= {NEAR_DUP_THRESHOLD}
    UNION ALL
    SELECT CAST(error('sketch oracle: vec_id missing from embeddings '
                      || 'view (sf mismatch?): ' || vid) AS INTEGER),
           NULL, NULL
    FROM missing
    ORDER BY a, b
    """


def cosine_dup_clusters_sql(sf_dir: str | None = None) -> str:
    """Recursive-CTE min-reachable fixpoint over the cosine near-dup
    pair oracle — the same resolution doc_dup_clusters' oracle applies
    to the Jaccard pairs (operators/text.py), over the embedding graph.
    Two WITH RECURSIVE parsing hazards are defused: the embedded pair
    query's trailing presentation sort is stripped (ORDER BY is illegal
    inside a recursive WITH; set membership is order-independent), and
    the query is wrapped in a derived table so its top-level UNION ALL
    (the sf-mismatch error guard) is not mistaken for a base/recursive
    member split, which would unbind its private CTEs."""
    inner = cosine_near_dup_sql(sf_dir).rstrip()
    assert inner.endswith("ORDER BY a, b"), inner[-60:]
    inner = inner[: inner.rfind("ORDER BY a, b")]
    return """
    WITH RECURSIVE pairs AS (SELECT * FROM ({inner}) q),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ),
    walk AS (
      SELECT src AS node, dst AS reach FROM edges
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ),
    labels AS (
      SELECT node, LEAST(node, MIN(reach)) AS cluster_rep
      FROM walk GROUP BY node
    ),
    sizes AS (
      SELECT cluster_rep, COUNT(*) AS cluster_size FROM labels GROUP BY 1
    )
    SELECT l.node AS vec_id, l.cluster_rep, s.cluster_size
    FROM labels l JOIN sizes s USING (cluster_rep)
    ORDER BY vec_id
    """.format(inner=inner)


def sketch_oracle_queries(sf_dir: str | None = None) -> dict[str, str]:
    return {
        "doc_minhash_lsh_pairs": minhash_sql(sf_dir),
        "doc_simhash_near_pairs": simhash_sql(sf_dir),
        "doc_fingerprint": fingerprint_sql(sf_dir),
        "emb_lsh_ann": lsh_ann_sql(sf_dir),
        "emb_ivf_ann": ivf_ann_sql(sf_dir),
        "emb_cosine_near_dup": cosine_near_dup_sql(sf_dir),
        "emb_dup_clusters": cosine_dup_clusters_sql(sf_dir),
    }
