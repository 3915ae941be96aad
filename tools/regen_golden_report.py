"""Regenerate tests/golden_report.json from the fixture corpus.

Run after an INTENTIONAL change to an analyzer, kernel, or the report
payload shape, and review the resulting diff like any other golden:

    python tools/regen_golden_report.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main() -> None:
    import tempfile

    import queryinfo_fixtures as QF

    from presto_workload_analyzer_spark.pipeline import build_silver
    from presto_workload_analyzer_spark.report.emitter import build_report
    from presto_workload_analyzer_spark.session import get_spark
    from presto_workload_analyzer_spark.sources.queryinfo import extract_queryinfo
    from test_report import _report_digest

    spark = get_spark(cpus=8)
    with tempfile.TemporaryDirectory() as d:
        docs = QF.golden_corpus()  # shared with tests/test_report.py
        for i, doc in enumerate(docs):
            (pathlib.Path(d) / f"q{i:03d}.json").write_text(json.dumps(doc))
        silver = build_silver(extract_queryinfo(spark, d))
        digest = _report_digest(build_report(silver))
    out = ROOT / "tests" / "golden_report.json"
    out.write_text(json.dumps(digest, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(digest['charts'])} charts)")


if __name__ == "__main__":
    main()
