"""Driver/executor-side (plain Python) twins of the unit-parsing kernels.

Used inside the mapInPandas extract stage, where metrics arrive as nested
JSON string values before any DataFrame column exists. Shares the
suffix-order tables with functions.units so both paths agree
(reference extract.py:30-63).
"""

from __future__ import annotations

from presto_workload_analyzer_spark.functions.units import SIZE_UNITS, TIME_UNITS


def _parse(s: str | None, units: list[tuple[str, float]]) -> float | None:
    if s is None:
        return None
    for suffix, factor in units:
        if s.endswith(suffix):
            try:
                return float(s[: -len(suffix)]) * factor
            except ValueError:
                return None
    try:
        return float(s)
    except ValueError:
        return None


def parse_time_py(s: str | None) -> float | None:
    return _parse(s, TIME_UNITS)


def parse_size_py(s: str | None) -> float | None:
    return _parse(s, SIZE_UNITS)
