"""Report emitter: analyzer outputs -> chart payloads -> HTML/zip/JSON sink."""

from presto_workload_analyzer_spark.report.emitter import build_report, write_report

__all__ = ["build_report", "write_report"]
