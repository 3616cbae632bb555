"""Date parse/compare helpers (SURVEY.md §2.8 X7, §2.2 F2).

The reference parses two fixed layouts — ``2006-01-02`` and
``2006-01-02T15:04:00Z`` (Go reference-time notation,
/root/reference/app/util/utils.go:5) — and derives row liveness from
``end_date``: a house row is active iff its end_date parses and lies in the
future (/root/reference/app/domain/address/dto/jsonHouseDto.go:76-83). The
delta-import watermark compares ``bazis_update_date >= import start``
(elasticAddressRepository.go:779,786). All of that is expressible with
built-in JVM date expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark datetime-pattern equivalents of the reference's Go layouts
DATE_LAYOUT = "yyyy-MM-dd"                    # utils.go:5 "2006-01-02"
TS_LAYOUT = "yyyy-MM-dd'T'HH:mm:ss'Z'"        # "2006-01-02T15:04:00Z"


def parse_date(col: Column | str) -> Column:
    """String in either reference layout -> DateType (null on no-parse,
    mirroring the reference's silent parse-error handling; try_* variants
    keep that semantics under Spark's default ANSI mode)."""
    return parse_timestamp(col).cast("date")


def parse_timestamp(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(TS_LAYOUT)),
        F.try_to_timestamp(c, F.lit(DATE_LAYOUT)),
    )


def is_active(end_date: Column | str, as_of: Column | None = None) -> Column:
    """F2 active-row predicate: end_date parses AND end_date > as_of
    (default: current date) — jsonHouseDto.go:77-79. Unparseable or null
    end_date -> inactive (the reference's IsActive returns false on parse
    error)."""
    d = parse_date(end_date)
    ref = as_of if as_of is not None else F.current_date()
    return d.isNotNull() & (d > ref)


def watermark_filter(
    col: Column | str, since: str, layout: str = DATE_LAYOUT
) -> Column:
    """ST2 watermark predicate: updated-at >= import-start
    (elasticAddressRepository.go:772-795)."""
    c = F.col(col) if isinstance(col, str) else col
    return parse_date(c) >= F.to_date(F.lit(since), layout)


def version_date_from_text(col: Column | str) -> Column:
    """Extract the trailing dd.MM.yyyy date from a version title string
    (importService.go:131-143 parses the FIAS version text tail)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(
        F.regexp_extract(c, r"(\d{2}\.\d{2}\.\d{4})\s*$", 1),
        F.lit("dd.MM.yyyy"),
    ).cast("date")
