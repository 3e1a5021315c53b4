"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship: the full combat-log DAG (parse -> sessionize
                     -> route -> aggregate) over the deterministic corpus,
                     returning the pulls table.
queries()         -> one callable per implemented operator (SURVEY.md par.2
                     plus the training-data ops). INVARIANT (round 7): the
                     registry holds at most 50 entries — the driver's
                     per-round correctness check caps at 50 rows and takes
                     them in dict order, so <= 50 means EVERY operator gets
                     a rows+schema+hash row every round. When adding an
                     operator, merge a near-duplicate demo into an
                     absorbing query (see relational.QUERIES note) rather
                     than exceeding the cap. Combat-grammar queries
                     synthesize their token-table input deterministically
                     (seeded; input shape per BASELINE.json input_hint) and
                     ARE value-checked: oracle_sql() registers a full DuckDB
                     SQL re-derivation of the parser for every combat_*
                     query (golden/sql_oracle.py).
oracle_sql()      -> DuckDB-equivalent SQL for EVERY query, including the
                     hash-sketch ops (minhash/simhash/fingerprint/lsh_ann,
                     golden/sketch_oracle.py: independent pure-Python XXH64
                     + SQL re-derivation of the banding/voting/blocking
                     pipelines) and the media ops (only the payload bytes
                     tabulated as hex; decode tiling / resize index math /
                     frame checksums re-derived in pure DuckDB SQL byte
                     math — independent of the Spark mapInPandas code).
                     Exact value parity via DECIMAL arithmetic,
                     string-formatted timestamps, floor-not-round doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from team_goldo_combat_log_parser_spark.golden.sketch_oracle import (
    sketch_oracle_queries)
from team_goldo_combat_log_parser_spark.golden.sql_oracle import (
    combat_oracle_queries)
from team_goldo_combat_log_parser_spark.operators import (
    multimodal, relational, similarity, text)
from team_goldo_combat_log_parser_spark.plans import aggregate as agg
from team_goldo_combat_log_parser_spark.plans.aggregate import _live
from team_goldo_combat_log_parser_spark.plans.pipeline import run_pipeline
from team_goldo_combat_log_parser_spark.report import chart
from team_goldo_combat_log_parser_spark.sources import datagen as dg

# the /chart/<id> drill-down target: the fixture log's first fight (the
# richest pull — every grammar variant appears in it)
CHART_LOG = "combat_2012-06-06_20_33_20_fixture"
CHART_SEQ = 1

# from_json schema for the pull `data` blob round-trip (combat_pull_json);
# one definition, shared with the chart composite
_PULL_JSON_SCHEMA = chart.PULL_JSON_SCHEMA


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


def _combat(which: str,
            limit: int | None = None) -> Callable[[SparkSession, str],
                                                  DataFrame]:
    """``limit`` applies to the ``results`` frame only: the reference
    lists every pull (main.py:345-348), fine at 9 rows but driver-bound
    at 10^6, so a capped listing must plan as TakeOrderedAndProject
    (per-partition top-K, no full sort/collect) — sort + limit in the
    same plan gives Spark exactly that (pinned in test_plan_shape)."""
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
            # J2: broadcast spell-dictionary enrich over typed spell_id
            "enrich": lambda: (
                _live(res.routed)
                .filter(F.col("r_damage_done") & ~F.col("m_immune"))
                .join(F.broadcast(spark.createDataFrame(
                    dg.spell_dim(),
                    "spell_id long, spell_name string, school string")),
                    "spell_id", "left")
                .groupBy(F.coalesce("school", F.lit("unknown")).alias("school"))
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.sum(F.when(F.col("amount") != 0, F.col("amount"))
                           .otherwise(0)).alias("total_damage"))),
            # O5: the pull `data` blob — to_json encode, from_json decode,
            # then scalar projections of the DECODED struct (value parity
            # proves the round-trip without relying on cross-engine JSON
            # text formatting)
            "pull_json": lambda: (
                agg.pull_json(res.pulls, res.damage_done_skills,
                              res.damage_received_skills, res.heal,
                              res.threat)
                .select("log_id", "fight_seq",
                        F.from_json("data", _PULL_JSON_SCHEMA).alias("d"))
                .select(
                    "log_id", "fight_seq",
                    F.col("d.target").alias("target"),
                    F.coalesce(F.size("d.damage_done"), F.lit(0))
                    .alias("n_dd"),
                    F.coalesce(F.size("d.damage_received"), F.lit(0))
                    .alias("n_dr"),
                    F.coalesce(F.size("d.heal"), F.lit(0)).alias("n_heal"),
                    F.coalesce(F.size("d.threat"), F.lit(0)).alias("n_threat"),
                    F.coalesce(F.aggregate(
                        "d.damage_done", F.lit(0).cast("long"),
                        lambda a, x: a + x["total_damage"]), F.lit(0))
                    .alias("dd_total"),
                    F.coalesce(F.aggregate(
                        "d.heal", F.lit(0).cast("long"),
                        lambda a, x: a + x["heal"]), F.lit(0))
                    .alias("heal_total"),
                    F.coalesce(F.aggregate(
                        "d.threat", F.lit(0).cast("long"),
                        lambda a, x: a + x["threat"]), F.lit(0))
                    .alias("threat_total"))),
            # O1/O6 + display conversion: the /results listing
            # (main.py:333-371) — pulls sorted with duration and the
            # pull start rendered in the report's Europe/Paris zone
            # (fromtimestamp(..., tz=PARIS_TZ) on the naive log instant)
            "results": lambda: res.pulls.select(
                "log_id", "fight_seq",
                F.date_format(
                    F.from_utc_timestamp(
                        F.col("pull_start").cast("timestamp"),
                        "Europe/Paris"),
                    "yyyy-MM-dd HH:mm:ss.SSS").alias("pull_start_paris"),
                "target", "n_players", "total_damage", "duration_s")
            # the reference's order_by(-start) lives IN the plan (a Sort
            # the engine can push to a TopK at scale), not in driver
            # Python; log_id/fight_seq break start-time ties stably
            .orderBy(F.desc("pull_start_paris"), F.desc("log_id"),
                     F.desc("fight_seq")),
            # paginated /results: newest `limit` pulls as a TopK plan
            "results_page": lambda: frames["results"]().limit(limit or 25),
            # E3 composite: the /chart/<id> page (main.py:375-557) — point
            # lookup of ONE pull, from_json decode of its data blob, all
            # nine gviz tables assembled from the DECODED struct (the read
            # path a report user actually hits)
            "chart": lambda: chart.chart_frame(
                agg.pull_json(res.pulls, res.damage_done_skills,
                              res.damage_received_skills, res.heal,
                              res.threat),
                CHART_LOG, CHART_SEQ),
            # skew-safe two-phase aggregation (salted partial agg) over the
            # boss-skewed received-damage rows — exactness vs a plain
            # GROUP BY in the oracle
            "damage_skew": lambda: agg.salted_agg(
                _live(res.routed).filter(F.col("r_damage_received"))
                .select("log_id", "line_no", "fight_seq",
                        F.col("src_name").alias("attacker"),
                        F.when(~(F.col("m_miss") | F.col("m_resist")
                                 | F.col("m_dodge")),
                               F.col("amount")).otherwise(0).alias("dmg")),
                ["log_id", "fight_seq", "attacker"], "dmg", "total_damage"),
        }
        out = frames[which]()
        if "section" in out.columns:
            return out  # chart frame carries its own total order
        if "pull_start_paris" in out.columns:
            return out  # results frame: pull_start DESC is part of the plan
        order = [c for c in ("log_id", "fight_seq", "player", "skill",
                             "attacker", "healer", "school") if c in out.columns]
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
    out.update(multimodal.QUERIES)
    for name in ("pulls", "damage_done_skills", "damage_received_skills",
                 "heal", "threat", "rates", "route_counts", "enrich",
                 "pull_json", "damage_skew", "results", "chart"):
        out[f"combat_{name}"] = _combat(name)
    # paginated /results: newest 5 pulls as a TakeOrderedAndProject plan
    out["combat_results_page"] = _combat("results_page", limit=5)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    out.update(text.ORACLE_SQL)
    out.update(similarity.ORACLE_SQL)
    out.update(multimodal.media_oracle_queries())
    # hash-sketch oracles: independent XXH64 + SQL re-derivation (MinHash/
    # SimHash) or sequential recomputation (fingerprint/ANN); inputs read
    # at the driver's correctness scale (SPARK_GRAFT_ORACLE_SF_DIR,
    # default sf0.01)
    out.update(sketch_oracle_queries())
    # combat_* oracles: the full parser re-derived in DuckDB SQL over the
    # same deterministic corpus embedded as VALUES (golden/sql_oracle.py) —
    # an independent second-engine derivation, not stored constants.
    out.update(combat_oracle_queries(_combat_corpus()))
    return out
