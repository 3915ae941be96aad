"""CLI end-to-end: extract -> process -> analyze over the fixture corpus,
through main() exactly as a user would run it."""

import gzip
import json
import zipfile

import pytest

from presto_workload_analyzer_spark.cli import main

from queryinfo_fixtures import fixtures


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_corpus")
    for i, doc in enumerate(fixtures()):
        with gzip.open(d / f"q{i:03d}.json.gz", "wt") as f:
            json.dump(doc, f)
    return d


def test_cli_pipeline(spark, corpus, tmp_path, capsys):
    summary = str(tmp_path / "summary")
    assert main(["extract", "-i", str(corpus), "-o", summary]) == 0
    assert "extracted 13 summaries" in capsys.readouterr().out

    clean = str(tmp_path / "clean")
    rc = main(
        ["process", "-i", summary, "-o", clean, "--rename-user", "--remove-query"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "processed 13 summaries" in out
    assert "Users translation table" in out and "'alice': 'user0'" in out

    report = str(tmp_path / "out.zip")
    assert main(["analyze", "-i", clean, "-o", report, "--high-contrast-mode"]) == 0
    assert "0 errors" in capsys.readouterr().out
    with zipfile.ZipFile(report) as z:
        html = z.read("output.html").decode()
    assert "scheduled by date" in html
    assert "alice" not in html  # obfuscated corpus feeds the report


def test_cli_analyze_filter_and_limit(spark, corpus, tmp_path, capsys):
    summary = str(tmp_path / "s2")
    main(["extract", "-i", str(corpus), "-o", summary, "-l", "5"])
    capsys.readouterr()
    out_json = str(tmp_path / "one.json")
    rc = main(["analyze", "-i", summary, "-o", out_json, "--filter", "queries_by_date"])
    assert rc == 0
    doc = json.loads(open(out_json).read())
    assert [c["id"] for c in doc["charts"]] == ["queries_by_date"]

    # unknown analyzer name -> usage error
    assert main(["analyze", "-i", summary, "-o", out_json, "--filter", "nope"]) == 2


def test_cli_single_file_and_template_contract(spark, corpus, tmp_path, capsys):
    """Reference-style invocation: `-o summary.jsonl.gz` lands ONE gzip file
    (extract.py:189-203 shape); `analyze --template-contract` emits the
    reference template's per-chart script blocks."""
    import os

    summary = str(tmp_path / "summary.jsonl.gz")
    assert main(["extract", "-i", str(corpus), "-o", summary]) == 0
    assert "extracted 13 summaries" in capsys.readouterr().out
    assert os.path.isfile(summary)
    with gzip.open(summary, "rt") as fh:
        assert sum(1 for line in fh if line.strip()) == 13

    html_out = str(tmp_path / "out.html")
    rc = main(
        ["analyze", "-i", summary, "-o", html_out, "--template-contract"]
    )
    assert rc == 0
    html = open(html_out).read()
    assert '<script type="application/json" id="scheduled_by_date">' in html
    assert "const structure = " in html
