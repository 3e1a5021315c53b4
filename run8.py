import sys, time
sys.path.insert(0, "/root/repo")
from team_goldo_combat_log_parser_spark.session import get_spark
from team_goldo_combat_log_parser_spark.plans.pipeline import run_pipeline
import bench
spark = get_spark("diag8", cores=8)
warm = spark.read.parquet("/tmp/goldo_bench/tokens_96x6x14000s42").limit(20000)
run_pipeline(spark, warm, cache=False).pulls.count()
t0=time.time()
dt, routed = bench.run_combat_e2e(spark, "/tmp/goldo_bench/tokens_96x6x14000s42")
print(f"e2e {dt:.1f}s {routed/dt:.0f} ev/s")
