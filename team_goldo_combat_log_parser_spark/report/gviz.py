"""Render the chart long-frame into gviz DataTable JSON dicts.

The reference embeds nine ``gviz_api.DataTable.ToJSon`` strings into its
chart page template (main.py:497-539); this renders the same
``{"cols": [...], "rows": [{"c": [{"v": ...}]}]}`` shape from the
long-format DataFrame that ``report.chart.chart_frame`` produces, one
DataTable per section.  Driver-side presentation layer: the input is one
fight's worth of rows (tens), never a distributed collect of raw data.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

# section -> (gviz columns: (id, label, type, source column))
_TABLES: dict[str, list[tuple[str, str, str]]] = {
    "1_skills": [("player", "Player", "string"), ("skill", "Skill", "string"),
                 ("hit", "Hits", "number"), ("dodged", "Dodged", "number"),
                 ("missed", "Missed", "number"),
                 ("total_damage", "Total Damage", "number")],
    "2_received": [("player", "Player", "string"),
                   ("attacker", "Attacker", "string"),
                   ("skill", "Skill", "string"), ("hit", "Hits", "number"),
                   ("missed", "Missed", "number"),
                   ("dodged", "Dodged", "number"),
                   ("shielded", "Shielded", "number"),
                   ("resisted", "Resisted", "number"),
                   ("total_damage", "Total Damage", "number"),
                   ("dmg_type", "Damage Type", "string")],
    "3_damage_players": [("player", "Player", "string"),
                         ("amount", "Damage", "number")],
    "4_heal_players": [("player", "Player", "string"),
                       ("amount", "heal", "number")],
    "5_received_players": [("player", "Player", "string"),
                           ("amount", "Damage Received", "number")],
    "6_threat_players": [("player", "Player", "string"),
                         ("amount", "threat", "number")],
}

# the bar charts divide the pie quantity by the pull duration
_BARS = {
    "3_damage_players": ("dps", "DPS"),
    "4_heal_players": ("hps", "HPS"),
    "5_received_players": ("dtps", "DTPS"),
}


def _table(rows: list[dict], cols: list[tuple[str, str, str]]) -> dict:
    return {
        "cols": [{"id": cid, "label": label, "type": typ}
                 for cid, label, typ in cols],
        "rows": [{"c": [{"v": r[cid]} for cid, _, _ in cols]}
                 for r in rows],
    }


def pull_chart_tables(chart_df: DataFrame) -> dict[str, Any]:
    """All nine gviz DataTables (+ page header fields) for one pull."""
    rows = [r.asDict() for r in chart_df.collect()]
    by_section: dict[str, list[dict]] = {}
    for r in rows:
        by_section.setdefault(r["section"], []).append(r)

    out: dict[str, Any] = {}
    hdr = by_section.get("0_header", [{}])[0]
    out["pull_target"] = hdr.get("target")
    out["pull_start_time"] = hdr.get("pull_start")
    out["pull_duration_ms"] = hdr.get("duration_ms")

    for section, cols in _TABLES.items():
        out[section[2:]] = _table(by_section.get(section, []), cols)

    # bar variants: rate_e6 -> float rate, same rows/order as the pies
    for section, (key, label) in _BARS.items():
        bar_rows = [
            {"player": r["player"],
             key: (r["rate_e6"] / 1e6 if r["rate_e6"] is not None else None)}
            for r in by_section.get(section, [])]
        out[key] = _table(bar_rows,
                          [("player", "Player", "string"),
                           (key, label, "number")])
    return out


def pull_chart_json(chart_df: DataFrame) -> str:
    return json.dumps(pull_chart_tables(chart_df), sort_keys=True)


# ------------------------------------------------------- /results listing

_RESULTS_COLS = [
    ("pull_start_time", "Pull start time", "string"),
    ("pull_target", "Pull target", "string"),
    ("pull_duration", "Pull duration (s)", "number"),
    ("total_damage", "Total damage", "number"),
    ("players_number", "Players", "number"),
    ("pull_id", "Pull id", "string"),
]


def results_table(results_df: DataFrame, limit: int | None = None) -> dict:
    """The /results listing (main.py:333-371) as a gviz DataTable dict:
    one row per pull, pull_id = '<log_id>#<fight_seq>' standing in for
    the Datastore entity id. The pull_start_time DESC order (the
    reference's order_by) is part of the ``combat_results`` PLAN — a
    Sort the engine can run distributed / push into a TopK — so this
    renderer only formats, never re-sorts. ``limit`` caps the listing
    INSIDE the plan (sort+limit -> TakeOrderedAndProject): the collect
    below then moves at most ``limit`` rows, not every pull ever seen."""
    if limit is not None:
        results_df = results_df.limit(limit)
    rows = [r.asDict() for r in results_df.collect()]
    mapped = [
        {"pull_start_time": r["pull_start_paris"],
         "pull_target": r["target"],
         "pull_duration": r["duration_s"],
         "total_damage": r["total_damage"],
         "players_number": r["n_players"],
         "pull_id": f"{r['log_id']}#{r['fight_seq']}"}
        for r in rows]
    return _table(mapped, _RESULTS_COLS)


def results_table_json(results_df: DataFrame) -> str:
    return json.dumps(results_table(results_df), sort_keys=True)
