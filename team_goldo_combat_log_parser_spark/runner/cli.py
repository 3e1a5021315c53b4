"""spark-submit entrypoint: resumable batch run of the combat pipeline.

Usage (cluster or local):

    spark-submit --py-files tglp_spark.zip -m team_goldo_combat_log_parser_spark.runner.cli \
        --input  /data/token_tables/...   (parquet; Iceberg scan if catalog configured) \
        --output /data/out/goldo          (sinks + aggregate tables) \
        --checkpoint /data/ckpt/goldo     (lineage manifest; resume point)

Each invocation processes only sources absent from the manifest, writes the
five event sinks + aggregate tables partitioned by log_id prefix, and
commits a manifest record with per-sink counts (the run's metrics).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import run_pipeline
from .checkpoint import Manifest, filter_unprocessed


def read_tokens(spark: SparkSession, path: str):
    if path.startswith("iceberg:"):
        return spark.read.format("iceberg").load(path[len("iceberg:"):])
    return spark.read.parquet(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("goldo-pipeline").getOrCreate()
    manifest = Manifest(args.checkpoint)

    tokens = read_tokens(spark, args.input)
    todo = filter_unprocessed(tokens, manifest)
    sources = [r["source"] for r in todo.select("source").distinct().collect()]
    if not sources:
        print(json.dumps({"status": "up-to-date", "new_sources": 0}))
        return 0

    res = run_pipeline(spark, todo)
    # Output layout: <output>/<table>/commit=<id>/ — the commit id is
    # allocated BEFORE any write, so a crash between the writes and the
    # manifest commit leaves only an unreferenced directory and the replay
    # overwrites it (idempotent / exactly-once), instead of appending
    # duplicate rows. Readers see `commit` as a partition column when
    # scanning <output>/<table>.
    commit_id = manifest.new_commit_id()
    counts: dict[str, int] = {}
    tables = [(f"sink_{name}", df) for name, df in res.sinks.items()]
    tables += [("pulls", res.pulls),
               ("damage_done_skills", res.damage_done_skills),
               ("damage_received_skills", res.damage_received_skills),
               ("heal", res.heal), ("threat", res.threat),
               ("rates", res.rates)]
    for name, df in tables:
        # Observation: row count rides along with the write — one action
        # per table, not write + recount
        obs = Observation(f"cnt_{name}")
        (df.observe(obs, F.count(F.lit(1)).alias("n"))
           .write.mode("overwrite")
           .parquet(f"{args.output}/{name}/commit={commit_id}"))
        counts[name] = obs.get["n"]
    routed = res.routed.select(
        *[F.sum(F.col(c).cast("long")).alias(c)
          for c in ["r_enter", "r_damage_done", "r_damage_received", "r_fa",
                    "r_heal", "r_exit", "r_threat"]]).collect()[0].asDict()
    res.unpersist()

    commit = manifest.commit(sources, counts, metrics={"routed": routed},
                             commit_id=commit_id)
    print(json.dumps({"status": "committed", "commit_id": commit,
                      "new_sources": len(sources), "counts": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
