"""HTML page assembly around the gviz payloads (reference
goldo_templates.py:3-226 + main.py:371-372,543-557 — re-created, not
copied: modern gstatic loader, own markup)."""

import json

import __spark_entry__ as entry_mod
from team_goldo_combat_log_parser_spark.report import gviz, html as rhtml

SF_DIR = "/root/testdata/sf0.001"


def _chart_tables(spark):
    return gviz.pull_chart_tables(
        entry_mod.queries()["combat_chart"](spark, SF_DIR))


def test_chart_page_embeds_all_nine_slots(spark):
    tables = _chart_tables(spark)
    page = rhtml.chart_page(tables)
    # every slot's payload is embedded verbatim and has a target div
    for slot, _cls, key in rhtml._CHART_SLOTS:
        assert json.dumps(tables[key]) in page, slot
        assert f"id='{slot}'" in page, slot
    # header fields surface
    assert str(tables["pull_target"]) in page
    assert str(tables["pull_start_time"]) in page
    assert page.startswith("<!DOCTYPE html>") and page.rstrip().endswith(
        "</html>")


def test_results_page_links_each_pull(spark):
    res = entry_mod.queries()["combat_results"](spark, SF_DIR)
    table = gviz.results_table(res)
    page = rhtml.results_page(table)
    for row in table["rows"]:
        pid = row["c"][-1]["v"]
        assert f"chart_{rhtml._slug(pid)}.html" in page
    # non-link cells unchanged
    assert str(table["rows"][0]["c"][0]["v"]) in page


def test_write_site_renders_index_results_and_charts(spark, tmp_path):
    res = entry_mod.queries()["combat_results"](spark, SF_DIR)
    first = res.collect()[0]
    pid = f"{first['log_id']}#{first['fight_seq']}"
    charts = {pid: entry_mod.queries()["combat_chart"](spark, SF_DIR)}
    paths = rhtml.write_site(str(tmp_path), res, charts)
    names = sorted(p.rsplit("/", 1)[-1] for p in paths)
    assert "index.html" in names and "results.html" in names
    assert any(n.startswith("chart_") for n in names)
    idx = (tmp_path / "index.html").read_text()
    assert "results.html" in idx
    n_pulls = res.count()
    assert f"{n_pulls} pull(s)" in idx
