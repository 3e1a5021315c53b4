"""One measured point at 10x the official bench scale (round-6 item 3).

Runs the combat pipeline end-to-end at sf1 (~5.8M-line token corpus, 10x
the per-round sf0.1 bench) and records the numbers the 100x-design
claims rest on:

* wall time + routed events/s for three timed runs (run 1 pays JIT),
  taken inside a certified-quiet window: the same request_hunter_stop()
  + wait_for_quiet() gate the official bench.py uses (VERDICT r6 item 1
  — the ungated r6 measurement showed the host window collapsing
  mid-run, runs [106.6, 234.0]), with gated/canary/floor stamped into
  the JSON so a low number is self-diagnosing;
* peak RSS (VmHWM) of the python driver process and of the local-mode
  JVM, sampled before and after the timed section — the python driver
  number is the "flat driver memory" claim (nothing per-row is ever
  collected); the JVM number conflates driver and executor roles in
  local mode and mostly reflects the line cache + shuffle buffers;
* total shuffle read/write bytes over the timed section, from Spark's
  public REST API (/api/v1/applications/<id>/stages), as the
  scale-sensitivity check: shuffle volume must grow ~linearly with the
  corpus, not quadratically.

Usage: python bench_scale10.py [sf]   (default 1.0; one JSON line out)
The corpus is cached under $SPARK_GRAFT_BENCH_CACHE (same key scheme as
bench.py), so re-runs skip generation.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import bench
from team_goldo_combat_log_parser_spark.session import get_spark
from team_goldo_combat_log_parser_spark.sources.token_io import (
    materialize_token_table)


def vm_hwm_mb(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/status") as f:
            for ln in f:
                if ln.startswith("VmHWM"):
                    return round(int(ln.split()[1]) / 1024.0, 1)
    except OSError:
        pass
    return None


def child_jvm_pid() -> int | None:
    """The local-mode JVM is the java child of this python process."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) == me and "java" in parts[1]:
                return int(pid)
        except (OSError, IndexError, ValueError):
            continue
    return None


def shuffle_totals(ui_port: int) -> dict[str, int]:
    base = f"http://localhost:{ui_port}/api/v1"
    with urllib.request.urlopen(f"{base}/applications", timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages", timeout=10) as r:
        stages = json.load(r)
    return {
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0)
                                  for s in stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0)
                                   for s in stages),
    }


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    ui_port = 4049
    spark = get_spark("scale10", cores=bench.CPUS,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": str(ui_port)})
    cfg = bench.corpus_cfg(sf)
    t0 = time.perf_counter()
    token_path = materialize_token_table(spark, cfg, bench.CORPUS_CACHE,
                                         partitions=max(bench.CPUS, 8))
    gen_sec = round(time.perf_counter() - t0, 1)
    n_lines = spark.read.parquet(token_path).count()

    jvm = child_jvm_pid()
    rss_before = {"python_mb": vm_hwm_mb(os.getpid()),
                  "jvm_mb": vm_hwm_mb(jvm) if jvm else None}
    sh_before = shuffle_totals(ui_port)

    bench.request_hunter_stop()
    gated, canary_pre, gate_waits = bench.wait_for_quiet()
    runs = []
    routed = 0
    for _ in range(3):
        dt, routed = bench.run_combat_e2e(spark, token_path)
        runs.append(round(dt, 3))
    canary_post = bench.canary_mips()

    sh_after = shuffle_totals(ui_port)
    rss_after = {"python_mb": vm_hwm_mb(os.getpid()),
                 "jvm_mb": vm_hwm_mb(jvm) if jvm else None}

    best = min(runs)
    out = {
        "metric": "combat_e2e_at_scale",
        "sf": sf,
        "corpus_lines": n_lines,
        "corpus_gen_sec": gen_sec,
        "routed_events": routed,
        "runs_sec": runs,
        "best_sec": best,
        "routed_events_per_sec": round(routed / best, 1),
        "lines_per_sec": round(n_lines / best, 1),
        "driver_rss": {"before": rss_before, "after": rss_after},
        "shuffle_delta_bytes": {
            k: sh_after[k] - sh_before[k] for k in sh_before},
        "canary_mips_pre": canary_pre,
        "canary_mips_post": canary_post,
        "gated": gated,
        "gate_floor_mips": bench.gate_floor(),
        "gate_frac": bench.GATE_FRAC,
        "gate_waits": gate_waits,
        "cpus": bench.CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
