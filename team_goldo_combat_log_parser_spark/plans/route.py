"""Row routing: the reference dispatch table as boolean Spark columns.

Reference ROW_DISPATCH_DICT (main.py:36-53) is a conjunctive-predicate ->
handler map where a row may fire several handlers (e.g. one damage row
fires parse_damage_done AND parse_threat). Here every handler becomes a
boolean ``r_*`` column computed in one codegen'd projection over the
fight-joined events; each sink is then a cheap filter over one cached DF.

Subtleties preserved:
 * ignore-pull gate (main.py:313-314): inside a duplicate fight only rows
   whose effect contains ExitCombat/Death ids reach dispatch at all; the
   enter row itself is always fully dispatched (the flag is set mid-row);
 * dispatch-order interplay: parse_exit_combat runs before parse_threat,
   so the exit row itself never accrues threat; parse_enter_combat runs
   first, so the enter row itself is already in combat for later handlers;
 * heal requires the *inverted* REVIVE match (main.py:45-46, 323-325);
 * healer attribution (main.py:251-253): healer_id is the last Force-Armor
   caster seen since the last exit (initialize_pull resets it) — expressed
   as window functions over one (log_id, line_no) ordering, no extra
   shuffle beyond the one partitioning by log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_routes(assigned: DataFrame) -> DataFrame:
    """Add routing flags + healer attribution to fight-joined events."""
    in_fight = F.col("fight_seq").isNotNull()
    dup = F.coalesce(F.col("is_duplicate"), F.lit(False))
    gate = (~dup | F.col("is_leave") | F.col("is_death")
            | (F.col("line_no") == F.col("start_line")))
    from_has_player = F.col("src_raw").contains(F.col("fight_player"))
    to_has_player = F.col("tgt_raw").contains(F.col("fight_player"))
    is_exit_row = in_fight & F.col("finished") & (F.col("line_no") == F.col("end_line"))

    # Round 9: the routed projection is now MAP-ONLY — no window, no
    # exchange. The healer as-of attribution (previously computed here
    # for EVERY row via one full-event window exchange) moved to
    # ``healer_asof`` below, evaluated over the SPARSE union of the only
    # rows that can affect or consume it (FA casts, exit rows, absorb
    # rows — aggregate.heal_per_healer is the sole consumer). The one
    # shuffle that moved every event's ~40 columns is gone from the hot
    # path (guide par.2.4: remove shuffles outright).
    return assigned.select(
        "*",
        gate.alias("gate_open"),
        is_exit_row.alias("is_exit_row"),
        (in_fight & (F.col("line_no") == F.col("start_line"))).alias("r_enter"),
        (in_fight & gate & F.col("is_damage") & from_has_player)
        .alias("r_damage_done"),
        (in_fight & gate & F.col("is_damage") & to_has_player)
        .alias("r_damage_received"),
        (in_fight & gate & F.col("is_heal_eff") & from_has_player
         & ~F.col("skill_has_revive")).alias("r_heal"),
        is_exit_row.alias("r_exit"),
        (in_fight & gate & F.col("has_threat") & from_has_player & ~is_exit_row)
        .alias("r_threat"),
        # Force-Armor tracking fires regardless of combat state (no
        # in_combat condition, main.py:43-44) but is still behind the
        # ignore-pull gate when inside a duplicate fight.
        (F.col("is_fa") & F.col("tgt_has_at") & (~in_fight | gate)).alias("r_fa"),
    ).drop("src_raw", "tgt_raw")
    # raws dropped here: every routing predicate that needed them is now
    # a boolean flag nothing downstream re-derives


def healer_asof(rows: DataFrame) -> DataFrame:
    """Healer as-of attribution over a row subset: adds ``healer_id`` =
    the last Force-Armor caster at-or-before each row whose cast is
    later than the last exit strictly before the row (reference
    main.py:251-253 — initialize_pull resets the healer).

    EXACTNESS over a subset: a window value at row r depends only on
    rows <= r in the same (log_id, line_no) order, and only FA rows and
    exit rows contribute to the three functions below — so evaluating
    over any subset that CONTAINS every FA row, every exit row, and the
    consuming rows yields identical healer_id values at the consuming
    rows as the former full-corpus window (pinned against the oracle's
    full-window SQL derivation by the combat_heal/rates/chart parity
    rows). heal_per_healer passes the sparse union (~0.1% of events), so
    the attribution exchange shuffles thousands of rows, not all of them."""
    w = Window.partitionBy("log_id").orderBy("line_no")
    w_cur = w.rowsBetween(Window.unboundedPreceding, 0)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    fa_caster = F.when(F.col("r_fa"), F.col("src_player"))
    fa_line = F.when(F.col("r_fa"), F.col("line_no"))
    h_name = F.last(fa_caster, ignorenulls=True).over(w_cur)
    h_line = F.last(fa_line, ignorenulls=True).over(w_cur)
    last_exit = F.max(F.when(F.col("is_exit_row"), F.col("line_no"))).over(w_prev)
    healer = F.when(
        h_line.isNotNull() & (last_exit.isNull() | (h_line > last_exit)),
        h_name,
    )
    return rows.select("*", healer.alias("healer_id"))


def sink_filters(routed: DataFrame) -> dict[str, DataFrame]:
    """Per-event-type fan-out (SURVEY.md S7): five filtered views of one
    cached routed DF — the parse UDF runs once, not five times."""
    return {
        "damage": routed.filter(F.col("r_damage_done") | F.col("r_damage_received")),
        "heal": routed.filter(F.col("r_heal")),
        "cast_event": routed.filter(F.col("is_event_verb")),
        "aura": routed.filter(F.col("is_apply_verb") | F.col("is_remove_verb")),
        "death": routed.filter(F.col("is_death")),
    }
