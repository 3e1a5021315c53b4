#!/usr/bin/env python
"""Measure T28's state-store bound (VERDICT r7 next #6): drive the
streaming ingest dedup over W waves of N docs each, event time
advancing one hour per wave with a 10-minute watermark delay, and
record state rows/bytes per micro-batch from the progress metrics.

The claim under test: state tracks distinct IN-HORIZON hashes
(~ arrival-rate x delay — here one wave, plus the previous wave until
the checkpointed watermark catches up), independent of stream
lifetime. A linear-in-lifetime state line would refute it; the
expected line plateaus at ~2N rows while the sink grows to W*N.

Usage: python scripts/diag_doc_stream_state.py [docs_per_wave] [waves]
Defaults 5000 x 6 (10x the pytest pin's volume). Prints one JSON line
per wave + a summary line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from team_goldo_combat_log_parser_spark.session import get_spark  # noqa: E402
from team_goldo_combat_log_parser_spark.streaming.doc_stream import (  # noqa: E402
    DOC_STREAM_SCHEMA, run_doc_dedup_once)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("diag_doc_stream_state", cores=8,
                      shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="goldo_t28_")
    in_dir, ck, out = (os.path.join(root, d) for d in ("in", "ck", "out"))
    per_wave = []
    try:
        for w in range(waves):
            ts = datetime(2026, 1, 1, 6 + w, 0, 0)
            rows = [(w * n + i, f"doc {w * n + i} body", "en",
                     f"s{i % 8}", 0, ts) for i in range(n)]
            (spark.createDataFrame(rows, DOC_STREAM_SCHEMA).coalesce(4)
             .write.mode("append").parquet(in_dir))
            m: list = []
            run_doc_dedup_once(spark, in_dir, ck, out, metrics=m)
            peak_rows = max(r["state_rows"] for r in m)
            peak_bytes = max(r["state_bytes"] for r in m)
            rec = {"wave": w, "docs_fed_total": (w + 1) * n,
                   "state_rows_peak": peak_rows,
                   "state_bytes_peak": peak_bytes,
                   "bytes_per_row": round(peak_bytes / max(peak_rows, 1), 1),
                   "batches": len(m)}
            per_wave.append(rec)
            print(json.dumps(rec), flush=True)
        sink = spark.read.parquet(out).count()
        plateau = max(r["state_rows_peak"] for r in per_wave[2:])
        print(json.dumps({
            "summary": "t28_state_bound",
            "docs_per_wave": n, "waves": waves, "sink_rows": sink,
            "lifetime_distinct": waves * n,
            "state_rows_plateau": plateau,
            "plateau_over_wave": round(plateau / n, 2),
            "bounded": plateau <= 2 * n,
        }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
