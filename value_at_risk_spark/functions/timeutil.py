"""Timezone-free epoch arithmetic for every Spark temporal type.

The driver's parquet fixtures carry tz-naive ``timestamp[us]`` columns,
which Spark 4 scans as TIMESTAMP_NTZ — and ANSI forbids casting
TIMESTAMP_NTZ to a numeric type (``CAST(ts AS BIGINT)`` raises
DATATYPE_MISMATCH), and ``unix_micros`` only accepts TIMESTAMP.
These helpers build the epoch from datediff + wall-clock field
extraction, which is defined for TIMESTAMP, TIMESTAMP_NTZ, and DATE
alike, and — crucially for oracle parity — is independent of
``spark.sql.session.timeZone`` for NTZ inputs, matching DuckDB's
``epoch()`` / ``epoch_us()`` on naive timestamps.

Equivalence is pinned in tests/test_functions.py: ``epoch_seconds`` ==
``unix_timestamp`` and ``epoch_micros`` == DuckDB ``epoch_us`` on the
events fixture.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since 1970-01-01 00:00:00 of the wall-clock reading
    (fractional seconds floored — same truncation as the old
    ``CAST(ts AS BIGINT)`` and DuckDB ``FLOOR(epoch(ts))``)."""
    c = _c(col)
    days = F.datediff(c.cast("date"), F.lit(_EPOCH).cast("date")).cast("long")
    return (
        days * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
        + F.second(c).cast("long")
    )


def epoch_micros(col: Column | str) -> Column:
    """Exact microseconds since the epoch of the wall-clock reading
    (``date_part('SECOND')`` keeps the microsecond fraction, so this is
    the drop-in replacement for ``unix_micros`` that also accepts
    TIMESTAMP_NTZ)."""
    c = _c(col)
    days = F.datediff(c.cast("date"), F.lit(_EPOCH).cast("date")).cast("long")
    whole_minutes = days * 1440 + F.hour(c).cast("long") * 60 + F.minute(c).cast("long")
    frac_us = (F.date_part(F.lit("SECOND"), c) * F.lit(1_000_000)).cast("long")
    return whole_minutes * 60_000_000 + frac_us
