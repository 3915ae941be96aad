"""Unit-suffixed metric strings -> floats, as pure Column expressions.

Presto emits every time/size metric as a human string ("1.5ms", "12.3GB").
The reference parses them with an ordered `str.endswith` scan and a bare
`float()` fall-through (reference extract.py:30-63). We reproduce the exact
semantics — including the suffix test ORDER ("ns" before "ms" before "us"
before "s", so "5us" never matches bare "s"; sizes largest-suffix-first so
"kB" is tested before "B") — as a chained `when()` Column expression. This
keeps parsing inside whole-stage codegen: no Python UDF, vectorized on the
JVM, usable at 100 TB scan width.

NULL input stays NULL (reference extract.py:50-51); a suffix-less numeric
string falls through to a plain double cast (extract.py:55); a non-numeric
string becomes NULL (Spark cast semantics) where the reference would raise —
permissive-by-default is the Spark-idiomatic choice and malformed rows are
counted upstream instead.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (suffix, factor) in the reference's test order — extract.py:30-46.
TIME_UNITS: list[tuple[str, float]] = [
    ("ns", 1e-9),
    ("ms", 1e-3),
    ("us", 1e-6),
    ("s", 1.0),
    ("m", 60.0),
    ("h", 3600.0),
    ("d", 86400.0),
]

SIZE_UNITS: list[tuple[str, float]] = [
    ("TB", 1024.0**4),
    ("GB", 1024.0**3),
    ("MB", 1024.0**2),
    ("kB", 1024.0),
    ("B", 1.0),
]


def _py_float(col: Column) -> Column:
    """String -> double with Python float() acceptance rules.

    Spark's cast delegates to Java parseDouble, which accepts a trailing
    d/D/f/F type suffix ("1.0d" -> 1.0) that Python float() — and therefore
    the reference's parser — rejects. Mask those before casting so the
    DataFrame path and the mapInPandas path agree on every input.
    """
    return F.when(col.rlike(r"[dDfF]\s*$"), F.lit(None).cast("double")).otherwise(
        col.try_cast("double")
    )


def _parse_units(col: Column, units: list[tuple[str, float]]) -> Column:
    expr = None
    for suffix, factor in units:
        # try_cast via _py_float: malformed numbers -> NULL even under ANSI
        # mode (the reference's float() would raise; permissive is the
        # scan-safe choice)
        value = _py_float(col.substr(F.lit(1), F.length(col) - len(suffix))) * factor
        cond = col.endswith(suffix)
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(_py_float(col))


def parse_time(col: Column | str) -> Column:
    """'1.5ms' -> 0.0015 (seconds). Reference extract.py:62-63."""
    col = F.col(col) if isinstance(col, str) else col
    return _parse_units(col, TIME_UNITS)


def parse_size(col: Column | str) -> Column:
    """'2kB' -> 2048.0 (bytes, binary multiples). Reference extract.py:58-59."""
    col = F.col(col) if isinstance(col, str) else col
    return _parse_units(col, SIZE_UNITS)
