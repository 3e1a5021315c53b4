"""Fight-scoped rollups (reference accumulators A2-A12 as hash aggregations).

The reference mutates nested dicts per fight (main.py:135-144); here each
nested level is a long-format DataFrame keyed by (log_id, fight_seq):

  damage_done_skills   (player, skill)            -> hit/dodged/missed/total
  damage_received_skills (player, attacker, skill) -> hit/dodged/shielded/
                                                      missed/resisted/total/type
  heal                 (healer)                    -> heal   (direct + absorb credit)
  threat               (player)                    -> threat
  pulls                fight header: start/stop(+midnight rollover)/target/
                       players_set/n_players/total_damage (+ data JSON blob)
  rates                dps/hps/dtps per player (report layer E3)

Mitigation precedence replicates the reference's ordered early-out loop
(DMG_RCVD_DISPATCH_DICT main.py:55-63, 203-208): miss preempts everything;
absorb credit is skipped when the row also missed; resist preempts the
dodge family; dodge/parry/deflect all bucket into `dodged` and preempt
shield; shield and absorb still count as hits.

Skew note (north rule): per-key partial aggregation (map-side combine) is
native for all sums/counts here; ``salted_agg`` provides an explicit
two-phase variant for the pathological case of one giant (fight, actor)
hot key so a single reducer never sees all its rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cnt(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


FIGHT_KEY = ["log_id", "fight_seq"]


def _live(routed: DataFrame) -> DataFrame:
    """Rows of finished, non-duplicate fights (only these are persisted)."""
    return routed.filter(
        F.col("fight_seq").isNotNull() & F.col("finished")
        & ~F.coalesce(F.col("is_duplicate"), F.lit(False)))


def damage_done_skills(routed: DataFrame) -> DataFrame:
    """Per (fight, player, skill): hit/dodged/missed counts + total_damage.

    NO_DAMAGE ('-immune') rows early-out before any accounting
    (main.py:151-152). amount==0 splits dodged-vs-missed on the DODGE id
    only (main.py:163-167).
    """
    dd = _live(routed).filter(F.col("r_damage_done") & ~F.col("m_immune"))
    zero = F.col("amount") == 0
    dodge_only = F.col("m_dodge_single")
    return (
        dd.groupBy(*FIGHT_KEY, F.col("fight_player").alias("player"),
                   F.col("skill"))
        .agg(
            _cnt(~zero).alias("hit"),
            _cnt(zero & dodge_only).alias("dodged"),
            _cnt(zero & ~dodge_only).alias("missed"),
            F.coalesce(F.sum(F.when(~zero, F.col("amount"))), F.lit(0))
            .alias("total_damage"),
        )
    )


def damage_done_players(routed: DataFrame) -> DataFrame:
    """Per (fight, player): running damage total (A3) + last target (A10)."""
    dd = _live(routed).filter(F.col("r_damage_done") & ~F.col("m_immune"))
    return (
        dd.groupBy(*FIGHT_KEY, F.col("fight_player").alias("player"))
        .agg(
            F.sum(F.when(F.col("amount") != 0, F.col("amount")).otherwise(0))
            .alias("amount"),
            F.max_by("tgt_name", "line_no").alias("target"),
        )
    )


def damage_received_skills(routed: DataFrame) -> DataFrame:
    """Per (fight, player, attacker, skill) with mitigation precedence."""
    dr = _live(routed).filter(F.col("r_damage_received"))
    miss = F.col("m_miss")
    resist = F.col("m_resist") & ~miss
    dodged = F.col("m_dodge") & ~F.col("m_miss") & ~F.col("m_resist")
    no_hit = F.col("m_miss") | F.col("m_resist") | F.col("m_dodge")
    shielded = F.col("m_shield") & ~no_hit
    # dmg_type: first-seen from any row whose raw amount != 0 (main.py:200-202)
    typed = F.when(F.col("amount") != 0,
                   F.struct(F.col("line_no"), F.col("dmg_type")))
    return (
        dr.groupBy(*FIGHT_KEY, F.col("fight_player").alias("player"),
                   F.col("src_name").alias("attacker"), F.col("skill"))
        .agg(
            _cnt(~no_hit).alias("hit"),
            _cnt(dodged).alias("dodged"),
            _cnt(shielded).alias("shielded"),
            _cnt(miss).alias("missed"),
            _cnt(resist).alias("resisted"),
            F.coalesce(F.sum(F.when(~no_hit, F.col("amount"))), F.lit(0))
            .alias("total_damage"),
            F.min(typed).getField("dmg_type").alias("dmg_type"),
        )
    )


def damage_received_players(routed: DataFrame) -> DataFrame:
    dr = _live(routed).filter(F.col("r_damage_received"))
    no_hit = F.col("m_miss") | F.col("m_resist") | F.col("m_dodge")
    return (
        dr.groupBy(*FIGHT_KEY, F.col("fight_player").alias("player"))
        .agg(F.sum(F.when(~no_hit, F.col("amount")).otherwise(0)).alias("amount"))
    )


def heal_per_healer(routed: DataFrame, fights: DataFrame) -> DataFrame:
    """Direct heals by the pull player + absorb credits to the healer.

    Absorb credit (main.py:213-229): rows routed as damage_received whose
    amount contains the ABSORB id and did not miss credit the absorbed
    value to the last Force-Armor caster — unless absorbed > raw (a pure
    shield absorb, excluded). The pull player always appears with >= 0.

    Round 9: the healer as-of attribution runs HERE, over the sparse
    union of the only rows that matter to it — FA casts (any combat
    state), exit rows, and the live absorb rows that consume the value —
    instead of as a full-corpus window inside the routed projection (see
    route.healer_asof for the exactness argument). The attribution
    window's exchange now carries ~0.1% of events.
    """
    from .route import healer_asof

    live = _live(routed)
    direct = (
        live.filter(F.col("r_heal"))
        .select(*FIGHT_KEY, F.col("fight_player").alias("healer"),
                F.col("amount").alias("val"))
    )
    is_absorb_credit = (
        F.col("r_damage_received") & F.col("m_absorb") & ~F.col("m_miss")
        & (F.col("absorbed") <= F.col("amount"))
        # the _live predicate, row-local so it can tag the sparse union
        & F.col("fight_seq").isNotNull() & F.col("finished")
        & ~F.coalesce(F.col("is_duplicate"), F.lit(False)))
    sparse = routed.filter(F.col("r_fa") | F.col("is_exit_row")
                           | is_absorb_credit)
    absorb = (
        healer_asof(sparse)
        .filter(is_absorb_credit)
        .select(*FIGHT_KEY, F.col("healer_id").alias("healer"),
                F.col("absorbed").alias("val"))
    )
    seed = (
        fights.filter(F.col("finished") & ~F.col("is_duplicate"))
        .select(F.col("log_id"), F.col("fight_seq"),
                F.col("player_id").alias("healer"), F.lit(0).alias("val"))
    )
    return (
        direct.unionByName(absorb).unionByName(seed)
        .groupBy(*FIGHT_KEY, "healer")
        .agg(F.sum("val").alias("heal"))
    )


def threat_per_player(routed: DataFrame, fights: DataFrame) -> DataFrame:
    """Sum of <T> on any in-combat row from the player (A7); may be negative."""
    t = (
        _live(routed).filter(F.col("r_threat"))
        .select(*FIGHT_KEY, F.col("fight_player").alias("player"),
                F.col("threat").alias("val"))
    )
    seed = (
        fights.filter(F.col("finished") & ~F.col("is_duplicate"))
        .select("log_id", "fight_seq", F.col("player_id").alias("player"),
                F.lit(0).cast("long").alias("val"))
    )
    return (t.unionByName(seed).groupBy(*FIGHT_KEY, "player")
            .agg(F.sum("val").alias("threat")))


def build_pulls(fights: DataFrame, dd_players: DataFrame) -> DataFrame:
    """The Pull entity (main.py:269-287): header + totals, midnight rollover."""
    live = fights.filter(F.col("finished") & ~F.col("is_duplicate"))
    stop_fixed = F.when(
        F.col("stop_ts") < F.col("start_ts"),
        F.col("stop_ts") + F.expr("INTERVAL 1 DAY"),
    ).otherwise(F.col("stop_ts"))
    p = (
        live.select(
            "log_id", "fight_seq",
            F.col("start_ts").alias("pull_start"),
            stop_fixed.alias("pull_stop"),
            F.col("player_id"),
        )
        .join(dd_players.withColumnRenamed("player", "player_id"),
              on=[*FIGHT_KEY, "player_id"], how="left")
    )
    return p.select(
        "log_id", "fight_seq", "pull_start", "pull_stop",
        F.col("target"),
        F.array(F.col("player_id")).alias("players_set"),
        F.lit(1).alias("n_players"),
        F.coalesce(F.col("amount"), F.lit(0)).alias("total_damage"),
        (F.unix_timestamp("pull_stop") - F.unix_timestamp("pull_start"))
        .alias("duration_s"),
    )


def rates(pulls: DataFrame, dd_players: DataFrame, heal: DataFrame,
          dr_players: DataFrame) -> DataFrame:
    """DPS / HPS / DTPS per (fight, player) — report layer (main.py:467-486)."""
    dur = pulls.select(*FIGHT_KEY, "pull_start", "pull_stop")
    # nullif(0): a fight whose enter and exit share a timestamp must yield
    # null rates, not Inf/NaN (the reference would divide by zero here)
    secs = F.nullif(
        F.col("pull_stop").cast("double") - F.col("pull_start").cast("double"),
        F.lit(0.0))
    base = (
        dd_players.select(*FIGHT_KEY, "player", F.col("amount").alias("dmg"))
        .join(heal.withColumnRenamed("healer", "player"),
              on=[*FIGHT_KEY, "player"], how="full")
        .join(dr_players.withColumnRenamed("amount", "dmg_rcvd"),
              on=[*FIGHT_KEY, "player"], how="full")
        .join(dur, on=FIGHT_KEY, how="inner")
    )
    return base.select(
        *FIGHT_KEY, "player",
        (F.coalesce(F.col("dmg"), F.lit(0)) / secs).alias("dps"),
        (F.coalesce(F.col("heal"), F.lit(0)) / secs).alias("hps"),
        (F.coalesce(F.col("dmg_rcvd"), F.lit(0)) / secs).alias("dtps"),
    )


def pull_json(pulls: DataFrame, dd_skills: DataFrame, dr_skills: DataFrame,
              heal: DataFrame, threat: DataFrame) -> DataFrame:
    """The `data` blob analogue (main.py:285): nested struct -> JSON string."""
    dd_n = (dd_skills.groupBy(*FIGHT_KEY)
            .agg(F.collect_list(F.struct("player", "skill", "hit", "dodged",
                                         "missed", "total_damage"))
                 .alias("damage_done")))
    dr_n = (dr_skills.groupBy(*FIGHT_KEY)
            .agg(F.collect_list(F.struct("player", "attacker", "skill", "hit",
                                         "dodged", "shielded", "missed",
                                         "resisted", "total_damage", "dmg_type"))
                 .alias("damage_received")))
    h_n = (heal.groupBy(*FIGHT_KEY)
           .agg(F.collect_list(F.struct("healer", "heal")).alias("heal")))
    t_n = (threat.groupBy(*FIGHT_KEY)
           .agg(F.collect_list(F.struct("player", "threat")).alias("threat")))
    out = (pulls.join(dd_n, FIGHT_KEY, "left").join(dr_n, FIGHT_KEY, "left")
           .join(h_n, FIGHT_KEY, "left").join(t_n, FIGHT_KEY, "left"))
    return out.withColumn(
        "data",
        F.to_json(F.struct("pull_start", "pull_stop", "target", "players_set",
                           "damage_done", "damage_received", "heal", "threat")),
    )


# ------------------------------------------------------------ skew-safe agg


def salted_agg(df: DataFrame, keys: list[str], value_col: str,
               out_col: str, buckets: int = 32) -> DataFrame:
    """Exact two-phase sum for skewed keys: partial agg on (keys, salt),
    final agg on keys. Salt derives from a per-row column hash so the hot
    key's rows spread over `buckets` reducers in phase one."""
    salted = df.withColumn("_salt", F.pmod(F.hash("line_no", "log_id"),
                                           F.lit(buckets)))
    partial = (salted.groupBy(*keys, "_salt")
               .agg(F.sum(value_col).alias("_part")))
    return partial.groupBy(*keys).agg(F.sum("_part").alias(out_col))
