"""Spatial operators: haversine distance and cell-bucketed radius join.

A radius self-join ("all pairs of points within R km") is the spatial
analogue of near-dup detection: the naive formulation is an O(n^2)
cross join, unaffordable at any scale. The affordable shape is the
same one the dedup tier uses — bucket, equi-join, verify:

1. quantize every point onto a square lat/lon grid whose cell edge is
   at least the radius in degrees (at the worst-case latitude of the
   data), so any pair within R km is at most one cell apart on each
   axis;
2. explode the LEFT side to its 3x3 cell neighborhood (a fixed x9
   blow-up, linear), keep the right side at its home cell;
3. equi-join on the cell id — each qualifying pair meets EXACTLY once
   (the right point has one home cell), so no post-join dedup;
4. verify with the exact haversine predicate.

The only shuffle is the cell-keyed equi-join; there is no cross join
and no forced broadcast, and cell skew (a dense city) is AQE's
skew-join case. At 100 TB the cell id doubles as a write-time
partition key so the join runs co-located.

The reference (a 196-line Dask map/gather wrapper) has no spatial
surface; this is an EXT capability of the large-scale-pipeline north
star (SURVEY §2b), paired with a DuckDB oracle that mirrors the cell
math token-for-token.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Mean Earth radius (km), the conventional haversine constant.
EARTH_RADIUS_KM = 6371.0088

#: km per degree of latitude (and of longitude at the equator).
KM_PER_DEG = 111.19492664455873  # 2*pi*R/360 for R = EARTH_RADIUS_KM


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (double, row-wise deterministic)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(dlon / 2), 2)
    )
    return (
        F.lit(2.0 * EARTH_RADIUS_KM)
        * F.asin(F.least(F.sqrt(a), F.lit(1.0)))
    )


def radius_self_join(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    *,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All unordered point pairs within ``radius_km``, bucket-joined.

    Returns ``(id_a, id_b, dist_km)`` with ``id_a < id_b`` and
    ``dist_km`` rounded to 6 dp. Only rows with ``|lat| <=
    max_abs_lat`` participate; rows beyond the band are EXCLUDED from
    the join by an explicit filter (callers with polar data raise
    ``max_abs_lat``; the cell edge grows as 1/cos(max_abs_lat)
    because longitude degrees shrink toward the poles — the 3x3
    neighborhood guarantee needs the cell edge >= the radius in
    LONGITUDE degrees at the extreme latitude). The filter makes the
    precondition enforced rather than documented: an out-of-band row
    previously kept its cell but could silently LOSE qualifying
    pairs, the unfalsifiable failure mode (r7 ADVICE). Rows with
    NULL id/lat/lon are likewise excluded. Longitude
    wraparound at the antimeridian is NOT handled: a pair straddling
    +/-180 deg is never a candidate (its cells are grid-distant);
    data crossing it should be rotated to a cut elsewhere first.

    Never a cross join: left side explodes to its 9-cell neighborhood,
    right side stays at its home cell, one equi-join on the cell id,
    exact haversine verification on the candidates. Each qualifying
    pair meets exactly once, so no dedup pass.
    """
    if not 0 < max_abs_lat < 90:
        raise ValueError("max_abs_lat must be in (0, 90)")
    from pyspark import StorageLevel

    cell_deg = radius_km / (KM_PER_DEG * math.cos(math.radians(max_abs_lat)))
    # Both join sides derive from the quantized point relation; persist
    # it so the upstream source is scanned ONCE (without this the
    # lineage duplicates and the source pays a second full scan).
    p = points.filter(
        F.col(id_col).isNotNull()
        & F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & (F.abs(F.col(lat_col)) <= F.lit(float(max_abs_lat)))
    ).select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
        F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long").alias("cy"),
        F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long").alias("cx"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    offsets = F.array(*[F.lit(o) for o in (-1, 0, 1)])
    left = (
        p.select(
            F.col("pid").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            "cy",
            "cx",
            F.explode(offsets).alias("dy"),
        )
        .select(
            "id_a",
            "lat_a",
            "lon_a",
            (F.col("cy") + F.col("dy")).alias("jy"),
            "cx",
            F.explode(offsets).alias("dx"),
        )
        .select(
            "id_a",
            "lat_a",
            "lon_a",
            "jy",
            (F.col("cx") + F.col("dx")).alias("jx"),
        )
    )
    right = p.select(
        F.col("pid").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cy").alias("jy"),
        F.col("cx").alias("jx"),
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        left.join(right, ["jy", "jx"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist <= F.lit(float(radius_km)))
        .select("id_a", "id_b", F.round(dist, 6).alias("dist_km"))
    )
