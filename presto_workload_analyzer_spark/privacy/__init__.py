from presto_workload_analyzer_spark.privacy.obfuscate import (
    apply_obfuscation,
    build_translation,
    collect_names,
    filter_by_schema,
    process_summary,
)

__all__ = [
    "apply_obfuscation",
    "build_translation",
    "collect_names",
    "filter_by_schema",
    "process_summary",
]
