"""Ad-hoc diagnostic: time one combat_e2e pass at a chosen core count
against an already-materialized bench corpus (used during the round-5/6
scaling investigations to spot-check per-core throughput outside the
full bench_scaling campaign machinery; kept for the next investigation).

Usage: python scripts/diag_e2e_at_cores.py [cores] [token_dir]
Defaults: 8 cores, the sf1-sized cached corpus under /tmp/goldo_bench.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from team_goldo_combat_log_parser_spark.plans.pipeline import run_pipeline  # noqa: E402
from team_goldo_combat_log_parser_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
token_dir = sys.argv[2] if len(sys.argv) > 2 \
    else "/tmp/goldo_bench/tokens_96x6x14000s42"

spark = get_spark("diag8", cores=cores)
warm = spark.read.parquet(token_dir).limit(20000)
run_pipeline(spark, warm, cache=False).pulls.count()
dt, routed = bench.run_combat_e2e(spark, token_dir)
print(f"e2e {dt:.1f}s {routed / dt:.0f} ev/s at {cores} cores")
