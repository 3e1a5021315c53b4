"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship: the full combat-log DAG (parse -> sessionize
                     -> route -> aggregate) over the deterministic corpus,
                     returning the pulls table.
queries()         -> one callable per implemented operator (SURVEY.md par.2
                     plus the training-data ops). Combat-grammar queries
                     synthesize their token-table input deterministically
                     (seeded; input shape per BASELINE.json input_hint) and
                     ARE value-checked: oracle_sql() registers a full DuckDB
                     SQL re-derivation of the parser for every combat_*
                     query (golden/sql_oracle.py). Only the hash-sketch ops
                     (minhash/simhash/fingerprint/lsh_ann) are rows-only,
                     with pytest recall gates instead.
oracle_sql()      -> DuckDB-equivalent SQL for every relational / text /
                     similarity operator (exact value parity via DECIMAL
                     arithmetic and string-formatted timestamps).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from team_goldo_combat_log_parser_spark.golden.sql_oracle import (
    combat_oracle_queries)
from team_goldo_combat_log_parser_spark.operators import relational, similarity, text
from team_goldo_combat_log_parser_spark.plans.pipeline import run_pipeline
from team_goldo_combat_log_parser_spark.sources import datagen as dg


def _combat_corpus() -> list[tuple[str, list[str]]]:
    """Deterministic combat-log corpus: golden fixture log + synthetic raid
    logs + adversarial edge cases (seeded, no wall clock). Sized so the
    DuckDB SQL oracle (which embeds the lines as VALUES) stays manageable
    while covering every grammar variant and edge case."""
    fixture_log = (
        "combat_2012-06-06_20_33_20_fixture.txt",
        [dg.enter_combat_line("21:00:00.000", dg.PLAYER),
         *dg.fixture_lines().values(),
         dg.exit_combat_line("23:59:00.000", dg.PLAYER)],
    )
    return [fixture_log,
            *dg.synth_corpus(dg.GenConfig(n_logs=2, fights_per_log=2,
                                          rows_per_fight=80, seed=42)),
            *dg.adversarial_logs()]


def _combat(which: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        res = run_pipeline(spark, dg.token_df(spark, _combat_corpus()),
                           cache=False)
        frames = {
            "pulls": lambda: res.pulls.select(
                "log_id", "fight_seq",
                F.date_format("pull_start", "yyyy-MM-dd HH:mm:ss.SSS")
                .alias("pull_start"),
                F.date_format("pull_stop", "yyyy-MM-dd HH:mm:ss.SSS")
                .alias("pull_stop"),
                "target", F.col("players_set").getItem(0).alias("player"),
                "n_players", "total_damage", "duration_s"),
            "damage_done_skills": lambda: res.damage_done_skills,
            "damage_received_skills": lambda: res.damage_received_skills,
            "heal": lambda: res.heal,
            "threat": lambda: res.threat,
            # floor(x*1e6) as BIGINT: engine-neutral (round() tie-breaking
            # on doubles differs between Spark and DuckDB)
            "rates": lambda: res.rates.select(
                "log_id", "fight_seq", "player",
                F.floor(F.col("dps") * 1e6).alias("dps_e6"),
                F.floor(F.col("hps") * 1e6).alias("hps_e6"),
                F.floor(F.col("dtps") * 1e6).alias("dtps_e6")),
            "route_counts": lambda: res.routed.select(
                *[F.sum(F.col(c).cast("int")).alias(c)
                  for c in ["r_enter", "r_damage_done", "r_damage_received",
                            "r_fa", "r_heal", "r_exit", "r_threat"]]),
        }
        out = frames[which]()
        order = [c for c in ("log_id", "fight_seq", "player", "skill",
                             "attacker", "healer") if c in out.columns]
        return out.orderBy(*order) if order else out
    return q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end combat pipeline -> pulls (plus a sanity scan of
    the sf0.001 star schema so the driver's parquet path is exercised)."""
    sf_dir = "/root/testdata/sf0.001"
    # touch the sf0.001 parquet (scan + agg) — cheap smoke of the IO path
    _ = relational.load(spark, sf_dir, "lineitem").count()
    return _combat("pulls")(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(text.QUERIES)
    out.update(similarity.QUERIES)
    for name in ("pulls", "damage_done_skills", "damage_received_skills",
                 "heal", "threat", "rates", "route_counts"):
        out[f"combat_{name}"] = _combat(name)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    out.update(text.ORACLE_SQL)
    out.update(similarity.ORACLE_SQL)
    # combat_* oracles: the full parser re-derived in DuckDB SQL over the
    # same deterministic corpus embedded as VALUES (golden/sql_oracle.py) —
    # an independent second-engine derivation, not stored constants.
    out.update(combat_oracle_queries(_combat_corpus()))
    return out
