"""Curation report (beyond-reference surface): the chart registry must
resolve entirely to oracle-gated driver queries, the document must build
non-vacuously over the test corpus, and the CLI sink must round-trip the
payload through each extension."""

import json
import os
import zipfile

import pytest

from presto_workload_analyzer_spark.report import curation

SF_DIR = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")


def test_chart_registry_resolves_to_gated_queries():
    from presto_workload_analyzer_spark import driver_queries

    registry = driver_queries.queries()
    missing = [n for n in curation.CURATION_CHARTS if n not in registry]
    assert missing == [], missing
    sections = {s for s, _cap in curation.CURATION_CHARTS.values()}
    assert sections <= set(curation._SECTION_ORDER)


@pytest.fixture(scope="module")
def report(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    return curation.build_curation_report(spark, SF_DIR, fail_on_error=True)


def test_report_builds_nonvacuously(report):
    assert report["errors"] == {}
    ids = [c["id"] for c in report["charts"]]
    assert len(ids) == len(set(ids))
    # every registered chart produced rows on this corpus
    assert set(ids) == set(curation.CURATION_CHARTS), (
        sorted(set(curation.CURATION_CHARTS) - set(ids))
    )
    for c in report["charts"]:
        assert c["data"] and c["columns"]
        assert len(c["data"][0]) == len(c["columns"])
        cap = curation.CURATION_CHARTS[c["id"]][1]
        assert len(c["data"]) <= cap
    m = report["structure"]["metrics"]
    assert m["n_documents"] > 0 and m["n_tokens"] > 0
    assert m["n_sources"] > 0 and m["n_embeddings"] > 0
    # charts arrive in section order
    secs = [curation.CURATION_CHARTS[i][0] for i in ids]
    order = {s: r for r, s in enumerate(curation._SECTION_ORDER)}
    assert secs == sorted(secs, key=order.__getitem__)


def test_html_and_sinks_roundtrip(report, tmp_path):
    html = curation.render_curation_html(report)
    payload = html.split('<script id="payload" type="application/json">', 1)[
        1
    ].split("</script>", 1)[0]
    doc = json.loads(payload)
    assert doc["structure"]["title"] == "Corpus curation report"
    assert len(doc["charts"]) == len(report["charts"])

    jp = tmp_path / "r.json"
    curation.write_curation_report(report, str(jp))
    assert json.loads(jp.read_text())["structure"]["metrics"] == report[
        "structure"
    ]["metrics"]

    zp = tmp_path / "r.zip"
    curation.write_curation_report(report, str(zp))
    with zipfile.ZipFile(zp) as z:
        assert "curation.html" in z.namelist()

    hp = tmp_path / "r.html"
    curation.write_curation_report(report, str(hp))
    assert hp.read_text().startswith("<!DOCTYPE html>")


def test_adversarial_corpus_strings_cannot_break_the_document():
    """Corpus-derived strings are UNTRUSTED (web-crawled text can carry
    markup): '</script>' inside a cell must not close the payload block,
    and no corpus string may reach the static HTML shell unescaped —
    rendering happens exclusively through textContent in the browser."""
    hostile = "</script><img src=x onerror=alert(1)>"
    report = {
        "structure": {"title": "Corpus curation report", "metrics": {"n": 1}},
        "charts": [
            {
                "id": "c1",
                "title": "t " + hostile,
                "description": "d " + hostile,
                "columns": ["a"],
                "data": [[hostile]],
            }
        ],
        "errors": {"q": hostile},
    }
    html = curation.render_curation_html(report)
    # the raw markup never appears in the document source...
    assert hostile not in html
    # ...and the payload still round-trips byte-identical through JSON
    payload = html.split('<script id="payload" type="application/json">', 1)[
        1
    ].split("</script>", 1)[0]
    doc = json.loads(payload)
    assert doc["charts"][0]["data"][0][0] == hostile
    assert doc["errors"]["q"] == hostile
    # the template builds DOM nodes; it never concatenates innerHTML
    assert "innerHTML" not in curation._CURATION_TEMPLATE


def test_unregistered_chart_name_degrades_to_per_chart_error(spark):
    """A CURATION_CHARTS entry missing from the registry must land in
    errors (per-chart tolerance), not kill the whole report."""
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    orig = dict(curation.CURATION_CHARTS)
    curation.CURATION_CHARTS["zz_not_registered"] = ("corpus", 10)
    try:
        doc = curation.build_curation_report(
            spark, SF_DIR, only=["zz_not_registered", "x121_hll_distinct"]
        )
    finally:
        curation.CURATION_CHARTS.clear()
        curation.CURATION_CHARTS.update(orig)
    assert "zz_not_registered" in doc["errors"]
    assert [c["id"] for c in doc["charts"]] == ["x121_hll_distinct"]


def test_cli_single_chart(tmp_path, spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    from presto_workload_analyzer_spark import cli

    out = tmp_path / "one.json"
    rc = cli.main(
        [
            "curation-report",
            "-d", SF_DIR,
            "-o", str(out),
            "--filter", "x121_hll_distinct",
            "--fail-on-error",
        ]
    )
    assert rc == 0
    doc = json.loads(out.read_text())
    assert [c["id"] for c in doc["charts"]] == ["x121_hll_distinct"]
    assert cli.main(
        ["curation-report", "-d", SF_DIR, "-o", str(out), "--filter", "nope"]
    ) == 2
