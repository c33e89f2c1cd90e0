"""Geospatial-lite operators: grid-cell-bucketed proximity joins with
haversine confirmation — the geo join pattern (geohash/S2/H3 cell bucketing
so candidates come from an equi-join, exact distance only on candidates)
expressed with pure SQL math, no geo libraries. Coordinates are derived
deterministically from entity keys (the fixture has no geo columns), with
the identical md5-based construction stated in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sol_spark.registry import register
from sol_spark.tables import load_tables

CELL_DEG = 10  # bucketing cell size (degrees); candidates come from 3x3 cells
N_LON_CELLS = 360 // CELL_DEG  # lon cells wrap modulo this at the antimeridian

# lat in [-60, 60), lon in [-180, 180), 5 decimal places, key-derived.
_LAT_SPARK = "(CAST(conv(substring(md5(cast({k} as string)), 1, 8), 16, 10) AS BIGINT) % 12000000) / 100000.0 - 60.0"
_LON_SPARK = "(CAST(conv(substring(md5(cast({k} as string)), 9, 8), 16, 10) AS BIGINT) % 36000000) / 100000.0 - 180.0"
_LAT_DUCK = "((('0x' || substr(md5(({k})::VARCHAR), 1, 8))::BIGINT % 12000000)::DOUBLE / 100000.0::DOUBLE) - 60.0"
_LON_DUCK = "((('0x' || substr(md5(({k})::VARCHAR), 9, 8))::BIGINT % 36000000)::DOUBLE / 100000.0::DOUBLE) - 180.0"

# Antimeridian-safe: sin^2((lon_b - lon_a)/2) has period 360 deg in the lon
# difference, so a raw delta of e.g. -359 deg scores identically to +1 deg.
# Only the CELL index needs explicit wrapping (pmod above), not the distance.
_HAV = (
    "2 * 6371.0 * asin(sqrt(power(sin(radians(lat_b - lat_a) / 2), 2) "
    "+ cos(radians(lat_a)) * cos(radians(lat_b)) * power(sin(radians(lon_b - lon_a) / 2), 2)))"
)

GEO_NEAREST_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, {_LAT_DUCK.format(k="'c' || c_custkey")} AS lat_a,
         {_LON_DUCK.format(k="'c' || c_custkey")} AS lon_a
  FROM customer
), supp AS (
  SELECT s_suppkey, {_LAT_DUCK.format(k="'s' || s_suppkey")} AS lat_b,
         {_LON_DUCK.format(k="'s' || s_suppkey")} AS lon_b
  FROM supplier
), supp_cells AS (
  SELECT s_suppkey, lat_b, lon_b,
         (floor(lat_b / {CELL_DEG}))::BIGINT AS cy,
         ((((floor(lon_b / {CELL_DEG}))::BIGINT % {N_LON_CELLS}) + {N_LON_CELLS}) % {N_LON_CELLS}) AS cx
  FROM supp
), cand AS (
  SELECT c.c_custkey, s.s_suppkey, c.lat_a, c.lon_a, s.lat_b, s.lon_b
  FROM cust c, (SELECT unnest(range(-1, 2)) AS dy) oy, (SELECT unnest(range(-1, 2)) AS dx) ox
  JOIN supp_cells s
    ON s.cy = (floor(c.lat_a / {CELL_DEG}))::BIGINT + oy.dy
   AND s.cx = ((((floor(c.lon_a / {CELL_DEG}))::BIGINT + ox.dx) % {N_LON_CELLS}) + {N_LON_CELLS}) % {N_LON_CELLS}
), scored AS (
  SELECT c_custkey, s_suppkey, {_HAV} AS dist_km,
         row_number() OVER (PARTITION BY c_custkey ORDER BY {_HAV}, s_suppkey) AS rn
  FROM cand
)
SELECT c_custkey AS custkey, s_suppkey AS nearest_suppkey, round(dist_km, 1) AS dist_km
FROM scored WHERE rn = 1 ORDER BY custkey
"""


@register("geo_nearest_supplier", GEO_NEAREST_ORACLE, tags=("geo", "join"))
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor geo join: each customer's closest supplier within
    its 3x3 grid-cell neighborhood ({CELL_DEG} deg cells), confirmed by
    haversine and ranked per customer. The cell join is the geohash/H3
    pattern: candidates come from an EQUI-join on the cell key (the
    customer side exploded across 9 neighbor cells via a broadcast offset
    table), so exact trigonometry runs only on candidates — never the
    customers x suppliers cross product. The longitude cell index wraps
    modulo {N_LON_CELLS} (pmod in Spark, double-% in the oracle) so cells
    straddling the lon +-180 antimeridian are neighbors; latitude does not
    wrap (points live in [-60, 60)). Customers whose neighborhood holds no
    supplier are absent by definition, and "nearest" is nearest-within-
    neighborhood — at |lat| <= 60 a {CELL_DEG} deg cell spans >= 556 km of
    longitude, so any supplier within ~556 km is guaranteed considered
    (production picks the cell size from point density, or re-probes with
    a wider ring). Neither join side is broadcast-pinned: the supplier
    side grows with SF, so AQE picks broadcast vs shuffle at runtime.

    Determinism: coordinates are md5-derived with the identical
    construction in both engines (cross-engine drift measured <= 3e-14
    deg), ranking ties break on supplier key."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        "c_custkey",
        F.expr(_LAT_SPARK.format(k="concat('c', c_custkey)")).cast("double").alias("lat_a"),
        F.expr(_LON_SPARK.format(k="concat('c', c_custkey)")).cast("double").alias("lon_a"),
    )
    supp = t["supplier"].select(
        "s_suppkey",
        F.expr(_LAT_SPARK.format(k="concat('s', s_suppkey)")).cast("double").alias("lat_b"),
        F.expr(_LON_SPARK.format(k="concat('s', s_suppkey)")).cast("double").alias("lon_b"),
    )
    offsets = spark.range(-1, 2).select(F.col("id").alias("dy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dx"))
    )
    cust_cells = cust.crossJoin(F.broadcast(offsets)).select(
        "c_custkey", "lat_a", "lon_a",
        (F.floor(F.col("lat_a") / CELL_DEG).cast("long") + F.col("dy")).alias("cy"),
        F.pmod(F.floor(F.col("lon_a") / CELL_DEG).cast("long") + F.col("dx"), F.lit(N_LON_CELLS)).alias("cx"),
    )
    supp_cells = supp.select(
        "s_suppkey", "lat_b", "lon_b",
        F.floor(F.col("lat_b") / CELL_DEG).cast("long").alias("cy"),
        F.pmod(F.floor(F.col("lon_b") / CELL_DEG).cast("long"), F.lit(N_LON_CELLS)).alias("cx"),
    )
    cand = cust_cells.join(supp_cells, ["cy", "cx"])
    w = Window.partitionBy("c_custkey").orderBy(F.expr(_HAV), "s_suppkey")
    return (
        cand.select(
            "c_custkey", "s_suppkey",
            F.expr(_HAV).alias("dist_km"),
            F.row_number().over(w).alias("rn"),
        )
        .where("rn = 1")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.round("dist_km", 1).alias("dist_km"),
        )
        .orderBy("custkey")
    )


RADIUS_KM = 300.0

GEO_RADIUS_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, {_LAT_DUCK.format(k="'c' || c_custkey")} AS lat_a,
         {_LON_DUCK.format(k="'c' || c_custkey")} AS lon_a
  FROM customer
), supp AS (
  SELECT s_suppkey, {_LAT_DUCK.format(k="'s' || s_suppkey")} AS lat_b,
         {_LON_DUCK.format(k="'s' || s_suppkey")} AS lon_b
  FROM supplier
), supp_cells AS (
  SELECT s_suppkey, lat_b, lon_b,
         (floor(lat_b / {CELL_DEG}))::BIGINT AS cy,
         ((((floor(lon_b / {CELL_DEG}))::BIGINT % {N_LON_CELLS}) + {N_LON_CELLS}) % {N_LON_CELLS}) AS cx
  FROM supp
), cand AS (
  SELECT c.c_custkey, s.s_suppkey, c.lat_a, c.lon_a, s.lat_b, s.lon_b
  FROM cust c, (SELECT unnest(range(-1, 2)) AS dy) oy, (SELECT unnest(range(-1, 2)) AS dx) ox
  JOIN supp_cells s
    ON s.cy = (floor(c.lat_a / {CELL_DEG}))::BIGINT + oy.dy
   AND s.cx = ((((floor(c.lon_a / {CELL_DEG}))::BIGINT + ox.dx) % {N_LON_CELLS}) + {N_LON_CELLS}) % {N_LON_CELLS}
)
SELECT c_custkey AS custkey, s_suppkey AS suppkey, round({_HAV}, 1) AS dist_km
FROM cand WHERE {_HAV} <= {RADIUS_KM}
ORDER BY custkey, suppkey
"""


@register("geo_radius_join", GEO_RADIUS_ORACLE, tags=("geo", "join"))
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius geo join: every (customer, supplier) pair within
    {RADIUS_KM} km — the spatial range-join companion to the
    nearest-neighbor query above, on the same cell-bucketed candidate
    machinery, with the lon cell index wrapped modulo {N_LON_CELLS} so the
    neighborhood is correct across the +-180 antimeridian. {CELL_DEG} deg
    cells cover the radius at these latitudes: one cell spans >= 556 km of
    longitude at |lat| <= 60 (10 deg * 111.32 km * cos 60) and 1113 km of
    latitude, both > {RADIUS_KM} km, so the wrapped 3x3 neighborhood is a
    strict superset of the {RADIUS_KM} km disc. Haversine evaluates only
    on cell-candidates; the filter threshold compares the raw double in
    both engines, with a ~{RADIUS_KM} km boundary and <= 1e-11 km
    cross-engine drift. No broadcast pin — AQE chooses the join strategy
    since the supplier side grows with SF."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        "c_custkey",
        F.expr(_LAT_SPARK.format(k="concat('c', c_custkey)")).cast("double").alias("lat_a"),
        F.expr(_LON_SPARK.format(k="concat('c', c_custkey)")).cast("double").alias("lon_a"),
    )
    supp = t["supplier"].select(
        "s_suppkey",
        F.expr(_LAT_SPARK.format(k="concat('s', s_suppkey)")).cast("double").alias("lat_b"),
        F.expr(_LON_SPARK.format(k="concat('s', s_suppkey)")).cast("double").alias("lon_b"),
    )
    offsets = spark.range(-1, 2).select(F.col("id").alias("dy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dx"))
    )
    cust_cells = cust.crossJoin(F.broadcast(offsets)).select(
        "c_custkey", "lat_a", "lon_a",
        (F.floor(F.col("lat_a") / CELL_DEG).cast("long") + F.col("dy")).alias("cy"),
        F.pmod(F.floor(F.col("lon_a") / CELL_DEG).cast("long") + F.col("dx"), F.lit(N_LON_CELLS)).alias("cx"),
    )
    supp_cells = supp.select(
        "s_suppkey", "lat_b", "lon_b",
        F.floor(F.col("lat_b") / CELL_DEG).cast("long").alias("cy"),
        F.pmod(F.floor(F.col("lon_b") / CELL_DEG).cast("long"), F.lit(N_LON_CELLS)).alias("cx"),
    )
    return (
        cust_cells.join(supp_cells, ["cy", "cx"])
        .where(F.expr(_HAV) <= RADIUS_KM)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("s_suppkey").alias("suppkey"),
            F.round(F.expr(_HAV), 1).alias("dist_km"),
        )
        .orderBy("custkey", "suppkey")
    )


# ---------------------------------------------------------------------------
# Grid-cell hotspot detection (Getis-Ord Gi*-lite over occupied cells)
# ---------------------------------------------------------------------------

GEO_HOTSPOT_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, {_LAT_DUCK.format(k="'c' || c_custkey")} AS lat,
         {_LON_DUCK.format(k="'c' || c_custkey")} AS lon
  FROM customer
), cells AS (
  SELECT (floor(lat / {CELL_DEG}))::BIGINT AS cy,
         ((((floor(lon / {CELL_DEG}))::BIGINT % {N_LON_CELLS}) + {N_LON_CELLS}) % {N_LON_CELLS}) AS cx,
         count(*)::BIGINT AS n
  FROM cust GROUP BY 1, 2
), scatter AS (
  SELECT c.cy + oy.dy AS ty,
         (((c.cx + ox.dx) % {N_LON_CELLS}) + {N_LON_CELLS}) % {N_LON_CELLS} AS tx,
         sum(c.n)::BIGINT AS s
  FROM cells c,
       (SELECT unnest(range(-1, 2)) AS dy) oy,
       (SELECT unnest(range(-1, 2)) AS dx) ox
  GROUP BY 1, 2
), stats AS (
  SELECT count(*)::BIGINT AS nc, sum(n)::BIGINT AS s1, sum(n * n)::BIGINT AS s2
  FROM cells
)
SELECT c.cy, c.cx, c.n, sc.s AS nbr_sum,
       round((sc.s::DOUBLE - 9.0 * (st.s1::DOUBLE / st.nc))
             / (3.0 * greatest(sqrt(st.s2::DOUBLE / st.nc
                 - (st.s1::DOUBLE / st.nc) * (st.s1::DOUBLE / st.nc)), 1e-12)), 6)
       + 0.0 AS z_gi
FROM cells c
JOIN scatter sc ON sc.ty = c.cy AND sc.tx = c.cx
CROSS JOIN stats st
ORDER BY c.cy, c.cx
"""


@register("geo_hotspots", GEO_HOTSPOT_ORACLE, tags=("geo", "stats", "audit"))
def geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot detection (Getis-Ord Gi*-lite): per occupied grid
    cell, the 3x3-neighborhood point mass and its z-score against the
    occupied-cell count distribution — the density screen behind "where
    do customers concentrate" maps. Neighborhoods are computed by
    SCATTERING each cell's count to its nine wrapped targets and
    re-aggregating (never a 9-way self-join), the longitude index wraps
    modulo {N_LON_CELLS} at the antimeridian exactly like the geo joins,
    and mean/variance come from exact integer cell moments, combined in
    one fixed-order double expression, rounded at 6 (empty cells are
    excluded from the reference field — a documented simplification of
    full Gi*).

    Scale shape: points collapse to the bounded cell grid in one
    map-side-combined hash-agg; everything after runs on <= {12 * N_LON_CELLS}
    rows."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        F.expr(_LAT_SPARK.format(k="concat('c', c_custkey)")).alias("lat"),
        F.expr(_LON_SPARK.format(k="concat('c', c_custkey)")).alias("lon"),
    )
    cells = cust.groupBy(
        F.expr(f"CAST(floor(lat / {CELL_DEG}) AS BIGINT)").alias("cy"),
        F.expr(
            f"pmod(CAST(floor(lon / {CELL_DEG}) AS BIGINT), {N_LON_CELLS})"
        ).alias("cx"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    offsets = (
        spark.range(-1, 2)
        .select(F.col("id").alias("dy"))
        .crossJoin(spark.range(-1, 2).select(F.col("id").alias("dx")))
    )
    scatter = (
        cells.crossJoin(F.broadcast(offsets))
        .groupBy(
            (F.col("cy") + F.col("dy")).alias("ty"),
            F.pmod(F.col("cx") + F.col("dx"), F.lit(N_LON_CELLS)).alias("tx"),
        )
        .agg(F.sum("n").cast("long").alias("s"))
    )
    stats = cells.agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("nc")
    sd = F.sqrt(F.col("s2").cast("double") / F.col("nc") - mu * mu)
    return (
        cells.join(scatter, (F.col("ty") == F.col("cy")) & (F.col("tx") == F.col("cx")))
        .crossJoin(F.broadcast(stats))
        .select(
            "cy", "cx", "n",
            F.col("s").alias("nbr_sum"),
            (
                F.round(
                    (F.col("s").cast("double") - 9.0 * mu)
                    / (3.0 * F.greatest(sd, F.lit(1e-12))),
                    6,
                )
                + 0.0
            ).alias("z_gi"),
        )
        .orderBy("cy", "cx")
    )
