"""Record the IVF recall@nprobe curve at two corpus sizes (round 7 —
evidence for the derived K = sqrt(n) rule in similarity.ivf_k_for).

Builds two seeded planted-cluster corpora (n and 10n, 64 overlapping
clusters, noise 0.45 — hard enough that quantizer quality matters),
measures recall vs an independent numpy brute force for the derived-K
quantizer across nprobe, plus the legacy fixed K=16 reference at its
default nprobe, and writes the table to BENCH/IVF_RECALL.md.

Usage: python scripts/ivf_recall_curve.py   (~5 min on local[8])
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from team_goldo_combat_log_parser_spark.operators import similarity as sim  # noqa: E402
from team_goldo_combat_log_parser_spark.session import get_spark  # noqa: E402
from team_goldo_combat_log_parser_spark.sources.datagen import (  # noqa: E402
    clustered_embeddings)

NOISE = 0.45
SIZES = (400, 4000)
OUT = "/root/repo/BENCH/IVF_RECALL.md"


def write_corpus(path: str, ids, mat) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array([int(i) for i in ids], pa.int32()),
        "embedding": pa.array([[float(x) for x in row] for row in mat],
                              pa.list_(pa.float32())),
        "label": pa.array([int(i) % 10 for i in ids], pa.int32()),
    })
    pq.write_table(tbl, f"{path}/embeddings.parquet")


def brute_topk(mat: np.ndarray) -> dict[int, set[int]]:
    m = mat.astype(np.float64)
    nrm = np.linalg.norm(m, axis=1)
    cos = (m[: sim.N_QUERIES] @ m.T) / np.outer(nrm[: sim.N_QUERIES], nrm)
    out = {}
    for q in range(sim.N_QUERIES):
        order = sorted(range(len(m)), key=lambda j: (-cos[q, j], j))
        out[q] = set([j for j in order if j != q][: sim.TOP_K])
    return out


def main() -> None:
    spark = get_spark("ivf_curve", cores=8)
    lines = [
        "# IVF recall@nprobe at two corpus sizes (round 7)",
        "",
        f"Planted-cluster corpora (64 clusters, noise {NOISE}, dim 16, "
        "seeded — sources/datagen.clustered_embeddings); ground truth = "
        "independent numpy brute-force cosine top-k for the "
        f"{sim.N_QUERIES} query vectors. K derived by "
        "similarity.ivf_k_for (K ~ sqrt(n)); the `fixed16` row is the "
        "legacy K=16 override at its default nprobe=4 for comparison. "
        "Scan fraction = nprobe/K; candidates per query ~ fraction x n.",
        "",
        "| n | quantizer | nprobe | scan frac | recall@5 |",
        "|---|---|---|---|---|",
    ]
    for n in SIZES:
        ids, mat = clustered_embeddings(n, noise=NOISE)
        d = f"/tmp/goldo_ivf_curve_{n}"
        write_corpus(d, ids, mat)
        exact = brute_topk(mat)
        k = sim.ivf_k_for(n)
        sim._ivf_model_cache.clear()

        def recall(**kw):
            got = {}
            for r in sim.emb_ivf_ann(spark, d, **kw).collect():
                got.setdefault(r["qid"], set()).add(r["neighbor_id"])
            rs = [len(got.get(q, set()) & exact[q]) / sim.TOP_K
                  for q in exact]
            return sum(rs) / len(rs)

        r_fixed = recall(k=sim.IVF_K, nprobe=sim.IVF_NPROBE)
        lines.append(
            f"| {n} | fixed16 | {sim.IVF_NPROBE} | "
            f"{sim.IVF_NPROBE / sim.IVF_K:.3f} | {r_fixed:.3f} |")
        for nprobe in (1, 2, 4, 8, 16, 32):
            if nprobe > k:
                break
            r = recall(nprobe=nprobe)
            lines.append(f"| {n} | derived K={k} | {nprobe} | "
                         f"{nprobe / k:.3f} | {r:.3f} |")
        sim._ivf_model_cache.clear()
    lines += [
        "",
        "Reading: at 10x the corpus the derived quantizer at the fixed "
        "config's scan fraction (nprobe 16/63 ~ 0.25) beats fixed K=16 "
        "(finer cells track clusters better at equal candidate budget), "
        "and holds most of its recall at 4x fewer candidates "
        "(nprobe=4, fraction 0.063) — the sub-linear serve path. "
        "Pinned by tests/test_sketch_and_media.py::"
        "test_ivf_scaled_k_beats_fixed_k_at_10x.",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
