"""Geo functions — SURVEY.md §2.8 X9, §2.6 O7.

The reference uses ES geo_distance filters/sorts (20km/5km radii,
/root/reference/app/infrastructure/persistence/address/elastic/repository/
elasticAddressRepository.go:577-640) over a "lat,lon" string geo_point parsed
at the API edge (grpc/handler/addressHandler.go:263-275). Spark form:
haversine as a column expression + parse helper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def parse_geo_point(col: Column) -> tuple[Column, Column]:
    """'lat,lon' string -> (lat, lon) doubles; malformed -> nulls
    (mirrors ES ignore_malformed, elasticAddressRepository.go:217-220)."""
    parts = F.split(F.trim(col), r"\s*,\s*")
    lat = F.try_element_at(parts, F.lit(1)).try_cast("double")
    lon = F.try_element_at(parts, F.lit(2)).try_cast("double")
    return lat, lon


def nearest(
    df: DataFrame,
    lat: float,
    lon: float,
    k: int = 1,
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_km: float | None = None,
) -> DataFrame:
    """Geo-distance filter + asc-distance sort + top-k (the reference's
    GetNearestCity/GetNearestAddress shape, :577-640)."""
    dist = haversine_km(
        F.col(lat_col), F.col(lon_col), F.lit(float(lat)), F.lit(float(lon))
    )
    out = df.withColumn("dist_km", dist)
    if radius_km is not None:
        out = out.filter(F.col("dist_km") <= radius_km)
    return out.orderBy(F.asc("dist_km")).limit(k)


def in_bounding_box(
    lat: Column,
    lon: Column,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> Column:
    """ES ``geo_bounding_box`` filter predicate: latitude in
    [bottom, top] and longitude in [left, right], with the anti-meridian
    wrap when ``left > right`` (ES's dateline-crossing box). A pure
    column expression — pushes down into the scan like any comparison."""
    if not -90.0 <= bottom <= top <= 90.0:
        raise ValueError("need -90 <= bottom <= top <= 90")
    lat_ok = (lat <= F.lit(float(top))) & (lat >= F.lit(float(bottom)))
    if left <= right:
        lon_ok = (lon >= F.lit(float(left))) & (lon <= F.lit(float(right)))
    else:  # crosses the anti-meridian
        lon_ok = (lon >= F.lit(float(left))) | (lon <= F.lit(float(right)))
    return lat_ok & lon_ok


def distance_rings(
    df: DataFrame,
    lat: float,
    lon: float,
    ranges: list[tuple[float | None, float | None]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES ``geo_distance`` aggregation: doc counts per ``[from, to)``
    distance ring (km) around an origin — from-inclusive / to-exclusive,
    open ends as None, overlapping rings counted independently, exactly
    like the numeric range agg. Returns ``(ring, cnt)`` with ES-style
    keys ``"from-to"`` / ``"*-to"`` / ``"from-*"`` in the given order.

    One pass: the haversine is a pure column expression and every ring is
    a conditional-sum aggregate over it — a single scan producing one
    scalar row (no shuffle of rows, no per-ring jobs), unpivoted
    driver-side.
    """
    if not ranges:
        raise ValueError("ranges must be non-empty")
    dist = haversine_km(
        F.col(lat_col), F.col(lon_col), F.lit(float(lat)),
        F.lit(float(lon)),
    )
    aggs, keys = [], []
    for i, (lo, hi) in enumerate(ranges):
        cond = dist.isNotNull()
        if lo is not None:
            cond = cond & (dist >= float(lo))
        if hi is not None:
            cond = cond & (dist < float(hi))
        keys.append(f"{'*' if lo is None else float(lo)}-"
                    f"{'*' if hi is None else float(hi)}")
        aggs.append(
            F.coalesce(F.sum(F.when(cond, F.lit(1))), F.lit(0))
            .cast("long").alias(f"_c{i}")
        )
    row = df.agg(*aggs).collect()[0]
    return df.sparkSession.createDataFrame(
        [(kk, int(row[f"_c{i}"])) for i, kk in enumerate(keys)],
        "ring string, cnt long",
    )
