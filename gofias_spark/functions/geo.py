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
