"""S1 input-format coverage: the Iceberg branch of the token-table reader.

The container ships no iceberg-spark-runtime jar (and has no network to
fetch one), so the real roundtrip is skip-marked; what CAN be proven
offline is proven: the `iceberg:` URI branch genuinely dispatches to the
Iceberg DataSource (the failure is DATA_SOURCE_NOT_FOUND for 'iceberg',
not a silent parquet fallback), and the parquet branch handles everything
else.
"""

import glob
import os
import socket

import pytest
from pyspark.sql import functions as F

from team_goldo_combat_log_parser_spark.runner.cli import (
    read_tokens, write_table)
from team_goldo_combat_log_parser_spark.session import (
    ICEBERG_PACKAGE, iceberg_conf)
from team_goldo_combat_log_parser_spark.sources import datagen as dg


def _has_iceberg_jar() -> bool:
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    if glob.glob(f"{spark_home}/jars/iceberg-spark-runtime*.jar"):
        return True
    # a previously Ivy-resolved runtime also counts
    ivy = os.path.expanduser("~/.ivy2*/jars/*iceberg-spark-runtime*.jar")
    return bool(glob.glob(ivy))


def _maven_reachable(timeout: float = 3.0) -> bool:
    """Quick probe so the spark.jars.packages attempt never hangs a
    fully-offline box on Ivy resolution."""
    try:
        socket.create_connection(("repo1.maven.org", 443),
                                 timeout=timeout).close()
        return True
    except OSError:
        return False


def test_iceberg_uri_dispatches_to_iceberg_source(spark):
    """`iceberg:` URIs must reach the Iceberg DataSource — with no runtime
    jar the load fails AT FORMAT RESOLUTION, naming 'iceberg'; a bug that
    silently fell through to the parquet reader would fail differently
    (path-not-found) or not at all."""
    with pytest.raises(Exception) as ei:
        read_tokens(spark, "iceberg:local.db.tokens").limit(1).collect()
    msg = str(ei.value)
    assert "iceberg" in msg.lower(), msg
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg


def test_parquet_branch_reads(spark, tmp_path):
    logs = dg.adversarial_logs()
    dg.write_token_table(spark, logs, str(tmp_path / "t"), 2)
    df = read_tokens(spark, str(tmp_path / "t"))
    assert df.count() == sum(len(ls) for _, ls in logs)
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source"}


def test_iceberg_write_dispatches_to_catalog(spark):
    """`iceberg:` OUTPUTS must reach the catalog API — with no catalog
    configured the write fails resolving the catalog by name, and no
    parquet directory is silently written instead."""
    df = spark.range(1).select(
        F.lit("combat_2012-01-01_00_00_00_x").alias("log_id"),
        F.col("id"))
    with pytest.raises(Exception) as ei:
        write_table(df, "iceberg:noicecat.db", "pulls", "c1")
    msg = str(ei.value)
    assert "noicecat" in msg or "catalog" in msg.lower(), msg
    # a buggy fallthrough to the parquet branch would create this literal
    # relative directory
    assert not os.path.exists("iceberg:noicecat.db")


@pytest.mark.skipif(
    not (_has_iceberg_jar() or _maven_reachable()),
    reason="no iceberg-spark-runtime jar and no network to resolve "
           f"{ICEBERG_PACKAGE} — install the jar or connect to run this")
def test_iceberg_roundtrip(tmp_path):
    """Full write/read roundtrip against a Hadoop-catalog Iceberg
    warehouse. Runs unchanged anywhere the pinned runtime jar is present
    (e.g. a real cluster); on a networked jar-less machine it pulls
    ICEBERG_PACKAGE via spark.jars.packages; fully-offline boxes skip.
    Runs in a SUBPROCESS: the catalog/extension/packages configs only
    apply to a fresh JVM — getOrCreate would silently reuse the test
    session and ignore them."""
    import subprocess
    import sys

    code = f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from pyspark.sql import SparkSession
from team_goldo_combat_log_parser_spark.session import iceberg_conf
from team_goldo_combat_log_parser_spark.runner.cli import read_tokens, write_table
from team_goldo_combat_log_parser_spark.sources import datagen as dg

b = SparkSession.builder.master("local[2]").appName("iceberg-rt")
for k, v in iceberg_conf({str(tmp_path / "wh")!r},
                         with_packages={not _has_iceberg_jar()!r}).items():
    b = b.config(k, v)
spark = b.getOrCreate()
logs = dg.adversarial_logs()
dg.token_df(spark, logs).writeTo("local.db.tokens").createOrReplace()
df = read_tokens(spark, "iceberg:local.db.tokens")
n = sum(len(ls) for _, ls in logs)
assert df.count() == n
# runner write branch: create, then replay the SAME commit — the
# per-commit overwrite must leave the row count unchanged (exactly-once),
# mirroring the parquet path's deterministic commit dirs
write_table(df, "iceberg:local.db", "tokens_w", "c1")
assert spark.table("local.db.tokens_w").count() == n
write_table(df, "iceberg:local.db", "tokens_w", "c1")
assert spark.table("local.db.tokens_w").count() == n
print("ICEBERG_ROUNDTRIP_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900)
    if r.returncode != 0:
        if _has_iceberg_jar():
            raise AssertionError(f"roundtrip failed with jar present:\n"
                                 f"{r.stderr[-2000:]}")
        pytest.skip("could not provision iceberg runtime via Ivy: "
                    + r.stderr[-500:])
    assert "ICEBERG_ROUNDTRIP_OK" in r.stdout
