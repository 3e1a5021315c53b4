#!/usr/bin/env python
"""Interleaved ABBA A/B of the pipeline's `cache_lines` default, run under
the DRIVER'S EXACT HARNESS (bench.py in a fresh subprocess per arm, same
corpus, same min-of-2 protocol), with CPU-canary-gated quiet windows.

Why this exists: round 3 changed the default to cache_lines=True on
single-session evidence ("-20% at local[32]") that the official bench
contradicted (combat_e2e 11.3s -> 15.3s). This host's deliverable CPU
swings ~1.6x over tens of seconds, so only paired, order-alternated,
fresh-process measurements gated on a quiet host can settle the default.

Protocol:
* >= PAIRS rounds; each round runs BOTH arms back-to-back in fresh
  `python bench.py` subprocesses (driver harness verbatim), order
  alternating on/off, off/on per round so linear host drift cancels in
  the median of per-round ratios.
* Before each ARM, a canary (1s x 32-proc busy loop) must read >=
  GATE_FRAC of the best capacity seen this session; otherwise wait and
  re-probe (bounded retries — a still-noisy window runs anyway but the
  round is flagged ungated and reported separately).
* Decision: the median over GATED rounds of (on_sec / off_sec). < 0.97
  -> cache_lines=True stays; > 1.03 -> flip default to False; inside the
  band -> keep the simpler plan (False: one cache fewer) and record the
  tie. Results + decision go to BENCH/CACHE_AB.md (and stdout as JSON).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
PAIRS = int(os.environ.get("SPARK_GRAFT_AB_PAIRS", "6"))
GATE_FRAC = float(os.environ.get("SPARK_GRAFT_AB_GATE", "0.88"))
GATE_RETRIES = int(os.environ.get("SPARK_GRAFT_AB_RETRIES", "8"))
GATE_WAIT_S = float(os.environ.get("SPARK_GRAFT_AB_WAIT", "20"))


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return x


def canary() -> float:
    """Instantaneous deliverable host capacity, Miters/s."""
    with mp.Pool(32) as p:
        r = p.map(_burn, range(32))
    return sum(r) / 1e6


def run_arm(cache_lines: bool) -> dict:
    env = {**os.environ,
           "PYTHONPATH": REPO,
           "SPARK_GRAFT_CACHE_LINES": "1" if cache_lines else "0",
           "SPARK_GRAFT_BENCH_QUERIES": "combat_e2e"}
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=1800,
                         env=env, cwd=REPO)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"arm failed: {out.stderr[-800:]}")


def main() -> None:
    best_cap = max(canary(), canary(), canary())
    rounds = []
    for rnd in range(PAIRS):
        order = [True, False] if rnd % 2 == 0 else [False, True]
        arm_out, caps, gated = {}, {}, True
        for cache_lines in order:
            cap, tries = canary(), 0
            best_cap = max(best_cap, cap)
            while cap < GATE_FRAC * best_cap and tries < GATE_RETRIES:
                time.sleep(GATE_WAIT_S)
                cap, tries = canary(), tries + 1
                best_cap = max(best_cap, cap)
            if cap < GATE_FRAC * best_cap:
                gated = False  # ran anyway in a noisy window; flagged
            r = run_arm(cache_lines)
            arm_out["on" if cache_lines else "off"] = r
            caps["on" if cache_lines else "off"] = round(cap, 1)
        on, off = arm_out["on"], arm_out["off"]
        rec = {
            "round": rnd,
            "order": "on,off" if order[0] else "off,on",
            "gated": gated,
            "canary_mips": caps,
            "on_sec": on["queries"]["combat_e2e"],
            "off_sec": off["queries"]["combat_e2e"],
            "on_eps": on["routed_events_per_sec"],
            "off_eps": off["routed_events_per_sec"],
            "on_first": on["combat_e2e_first_run_sec"],
            "off_first": off["combat_e2e_first_run_sec"],
            "ratio_on_over_off": round(
                on["queries"]["combat_e2e"] / off["queries"]["combat_e2e"], 3),
        }
        rounds.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)

    gated_rounds = [r for r in rounds if r["gated"]] or rounds
    med_ratio = statistics.median(
        r["ratio_on_over_off"] for r in gated_rounds)
    med_ratio_all = statistics.median(
        r["ratio_on_over_off"] for r in rounds)
    if med_ratio < 0.97:
        decision = "keep cache_lines=True (on is faster)"
        winner = "on"
    elif med_ratio > 1.03:
        decision = "flip default to cache_lines=False (off is faster)"
        winner = "off"
    else:
        decision = ("tie within the noise band -> prefer the simpler plan "
                    "(cache_lines=False: one persist fewer)")
        winner = "off"
    result = {
        "metric": "cache_lines_ab_median_ratio_on_over_off",
        "value": med_ratio,
        "unit": "ratio",
        "median_ratio_all_rounds": med_ratio_all,
        "gated_rounds": len(gated_rounds),
        "total_rounds": len(rounds),
        "winner": winner,
        "decision": decision,
        "rounds": rounds,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# cache_lines A/B — driver-harness ABBA protocol",
        "",
        "Each round runs `python bench.py` (the driver's own harness, "
        "fresh process, min-of-2 combat_e2e) once per arm, order "
        "alternating per round; every arm start is gated on a CPU canary "
        f"reading >= {GATE_FRAC:.2f}x the session-best capacity "
        f"(bounded retries, {GATE_WAIT_S:.0f}s backoff). "
        "Arms differ ONLY in SPARK_GRAFT_CACHE_LINES.",
        "",
        "| round | order | gated | canary on/off (M/s) | on (s) | off (s) "
        "| on ev/s | off ev/s | ratio on/off |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rounds:
        lines.append(
            f"| {r['round']} | {r['order']} | {'y' if r['gated'] else 'NO'} "
            f"| {r['canary_mips']['on']}/{r['canary_mips']['off']} "
            f"| {r['on_sec']} | {r['off_sec']} | {r['on_eps']:,.0f} "
            f"| {r['off_eps']:,.0f} | {r['ratio_on_over_off']} |")
    lines += [
        "",
        f"**Median ratio on/off (gated rounds, n={len(gated_rounds)}): "
        f"{med_ratio:.3f}** (all rounds: {med_ratio_all:.3f}).",
        f"**Decision: {decision}.**",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "CACHE_AB.md"), "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    main()
