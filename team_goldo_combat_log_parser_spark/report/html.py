"""Static HTML pages around the gviz DataTable JSON payloads.

The reference app's final surface is three HTML pages that embed
``gviz_api`` JSON into Google Charts (reference goldo_templates.py:3-141
chart page, 144-183 results table page, 186-226 landing page; filled in
main.py:371-372 and main.py:543-557).  This module re-creates that
surface from scratch on top of ``report.gviz``'s dicts: the same nine
chart/table slots per pull, the same pull listing, and an index page —
rendered with the current Google Charts loader (gstatic) instead of the
long-deprecated ``google.com/jsapi``, and our own minimal styling.

Everything here is driver-side string assembly over a handful of
already-aggregated rows; the distributed work ends at the DataFrames
that feed ``gviz.pull_chart_tables`` / ``gviz.results_table``.
"""

from __future__ import annotations

import html as _html
import json
import os
from typing import Any, Mapping

from pyspark.sql import DataFrame

from . import gviz

_LOADER = "https://www.gstatic.com/charts/loader.js"

_STYLE = """
    body { font-family: Georgia, 'Times New Roman', serif;
           margin: 1.5rem auto; max-width: 70rem; color: #3b3b33; }
    h1, h2 { text-align: center; color: #b8860b; }
    .meta { text-align: center; font-size: 1.1rem; }
    .row { display: flex; flex-wrap: wrap; justify-content: center; }
    .row > div { min-width: 28rem; min-height: 18rem; }
    .google-visualization-table { margin: 1rem auto; }
"""

# slot -> (div id, chart class, section key in gviz.pull_chart_tables)
_CHART_SLOTS: list[tuple[str, str, str]] = [
    ("pie_dmg", "PieChart", "damage_players"),
    ("bar_dmg", "BarChart", "dps"),
    ("pie_heal", "PieChart", "heal_players"),
    ("bar_heal", "BarChart", "hps"),
    ("pie_received", "PieChart", "received_players"),
    ("bar_dtps", "BarChart", "dtps"),
    ("pie_threat", "PieChart", "threat_players"),
    ("skill_table", "Table", "skills"),
    ("dmg_table", "Table", "received"),
]

_TITLES = {
    "pie_dmg": "Damage done", "bar_dmg": "DPS",
    "pie_heal": "Healing done", "bar_heal": "HPS",
    "pie_received": "Damage received", "bar_dtps": "DTPS",
    "pie_threat": "Threat", "skill_table": "Damage by skill",
    "dmg_table": "Damage received detail",
}


def _draw_js(slot: str, cls: str, payload: dict) -> str:
    opts = {"title": _TITLES[slot]}
    if cls == "Table":
        opts = {"showRowNumber": True, "allowHtml": True}
    return (
        f"  new google.visualization.{cls}"
        f"(document.getElementById('{slot}')).draw(\n"
        f"    new google.visualization.DataTable({json.dumps(payload)}),\n"
        f"    {json.dumps(opts)});\n"
    )


def _page(title: str, head_js: str, body: str) -> str:
    return (
        "<!DOCTYPE html>\n<html><head>\n"
        f"<meta charset='utf-8'><title>{_html.escape(title)}</title>\n"
        f"<style>{_STYLE}</style>\n"
        f"<script src='{_LOADER}'></script>\n"
        f"<script>\n{head_js}</script>\n"
        f"</head><body>\n{body}\n</body></html>\n"
    )


def chart_page(tables: Mapping[str, Any]) -> str:
    """One pull's chart page (reference /chart/<id>, main.py:446-557):
    seven pie/bar charts + the two detail tables, fed by the dicts from
    ``gviz.pull_chart_tables``."""
    draws = "".join(_draw_js(slot, cls, tables[key])
                    for slot, cls, key in _CHART_SLOTS)
    head_js = (
        "google.charts.load('current', "
        "{packages: ['corechart', 'table']});\n"
        "google.charts.setOnLoadCallback(function () {\n"
        f"{draws}"
        "});\n"
    )
    dur_s = (tables.get("pull_duration_ms") or 0) / 1000.0
    body = (
        f"<h1>Pull: {_html.escape(str(tables.get('pull_target')))}</h1>\n"
        f"<p class='meta'>Start: "
        f"{_html.escape(str(tables.get('pull_start_time')))}"
        f" &middot; Duration: {dur_s:.3f}s</p>\n"
        + "".join(
            f"<div class='row'><div id='{a}'></div><div id='{b}'></div>"
            "</div>\n"
            for a, b in [("pie_dmg", "bar_dmg"), ("pie_heal", "bar_heal"),
                         ("pie_received", "bar_dtps")])
        + "<div class='row'><div id='pie_threat'></div></div>\n"
        + "<h2>Damage by skill</h2><div id='skill_table'></div>\n"
        + "<h2>Damage received</h2><div id='dmg_table'></div>\n"
    )
    return _page("Combat log results — charts", head_js, body)


def results_page(table: Mapping[str, Any]) -> str:
    """The pull listing page (reference /results, main.py:333-372): one
    gviz Table whose rows come pre-sorted from the ``combat_results``
    plan (pull_start DESC — the sort lives in the engine, not here).
    The pull_id column is rendered as a link to the per-pull chart page,
    like the reference's Datastore-id anchor."""
    linked = {
        "cols": table["cols"],
        "rows": [
            {"c": row["c"][:-1] + [{
                "v": f"<a href='chart_{_slug(row['c'][-1]['v'])}.html'>"
                     f"{_html.escape(str(row['c'][-1]['v']))}</a>"}]}
            for row in table["rows"]],
    }
    head_js = (
        "google.charts.load('current', {packages: ['table']});\n"
        "google.charts.setOnLoadCallback(function () {\n"
        "  new google.visualization.Table"
        "(document.getElementById('results')).draw(\n"
        f"    new google.visualization.DataTable({json.dumps(linked)}),\n"
        "    {showRowNumber: true, allowHtml: true});\n"
        "});\n"
    )
    body = "<h1>Combat log results</h1>\n<div id='results'></div>\n"
    return _page("Combat log results", head_js, body)


def index_page(n_pulls: int) -> str:
    """Landing page (reference main.py:66-69): static output has no
    upload form, so this links straight to the results listing."""
    body = (
        "<h1>Combat Log Parser</h1>\n"
        f"<p class='meta'>{n_pulls} pull(s) parsed &middot; "
        "<a href='results.html'>Browse results</a></p>\n"
    )
    return _page("Combat Log Parser", "", body)


def _slug(pull_id: Any) -> str:
    return "".join(ch if ch.isalnum() or ch in "-_." else "_"
                   for ch in str(pull_id))


def write_site(out_dir: str, results_df: DataFrame,
               charts: Mapping[str, DataFrame]) -> list[str]:
    """Render the whole static site: index.html, results.html, and one
    chart_<pull_id>.html per entry in ``charts`` (pull_id -> chart
    long-frame from ``report.chart.chart_frame``).  Returns the paths
    written.  Driver-side: every input frame is one fight's aggregates
    (tens of rows), the scale-bearing work happened upstream."""
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def _put(name: str, content: str) -> None:
        path = os.path.join(out_dir, name)
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(content)
        written.append(path)

    rt = gviz.results_table(results_df)
    _put("results.html", results_page(rt))
    for pull_id, chart_df in charts.items():
        _put(f"chart_{_slug(pull_id)}.html",
             chart_page(gviz.pull_chart_tables(chart_df)))
    _put("index.html", index_page(len(rt["rows"])))
    return written
