"""Geo payload filtering — the reference backends' geo query surface
(Qdrant geo_radius / geo_bounding_box payload filters, Elasticsearch
geo_distance, Weaviate geoCoordinates filter).

The test tables carry no coordinate columns, so coordinates are
DERIVED deterministically from the customer key (an integer-exact
pseudo-placement both engines compute identically); the operator
itself — distance math + radius predicate + ordered page — is the
real surface.

Determinism: great-circle trig (sin/cos/asin) is NOT bit-reproducible
across engines (JVM Math vs libm differ in the last ulp), so distance
uses the standard equirectangular planar approximation with the
latitude-scale factor precomputed once in Python and inlined as the
SAME literal on both sides. The remaining ops are +,*,sqrt — all
IEEE-exact — so the radius comparison can be an exact predicate with
no rounding tolerance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..registry import register

# Query center (lat0, lon0) and the planar scale factors, km per
# degree: meridional 110.574, zonal 111.320*cos(lat0) — inlined as
# exact literals shared by the Spark plan and the DuckDB oracle.
GEO_LAT0 = 40.0
GEO_LON0 = -74.0
KM_PER_DEG_LAT = 110.574
KM_PER_DEG_LON = 111.320 * math.cos(math.radians(GEO_LAT0))
GEO_RADIUS_KM = 2000.0


def with_coords(cust: DataFrame) -> DataFrame:
    """Deterministic pseudo-coordinates from the integer key — exact
    integer modulus then one double division on both engines."""
    return cust.withColumn(
        "lat", ((F.col("c_custkey") * 9973) % 18000) / 100.0 - 90.0
    ).withColumn(
        "lon", ((F.col("c_custkey") * 7919) % 36000) / 100.0 - 180.0)


def planar_km(lat: F.Column, lon: F.Column) -> F.Column:
    dy = (lat - F.lit(GEO_LAT0)) * F.lit(KM_PER_DEG_LAT)
    dx = (lon - F.lit(GEO_LON0)) * F.lit(KM_PER_DEG_LON)
    return F.sqrt(dx * dx + dy * dy)


@register("geo_radius_search", oracle=f"""
WITH geo AS (
  SELECT c_custkey, c_name, c_mktsegment,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
d AS (
  SELECT c_custkey, c_name, c_mktsegment, lat, lon,
         sqrt(((lon - ({GEO_LON0!r})) * {KM_PER_DEG_LON!r})
              * ((lon - ({GEO_LON0!r})) * {KM_PER_DEG_LON!r})
              + ((lat - {GEO_LAT0!r}) * {KM_PER_DEG_LAT!r})
                * ((lat - {GEO_LAT0!r}) * {KM_PER_DEG_LAT!r})) AS dist_km
  FROM geo)
SELECT c_custkey, c_name, c_mktsegment, lat, lon, dist_km
FROM d WHERE dist_km <= {GEO_RADIUS_KM!r}
ORDER BY dist_km, c_custkey
LIMIT 100
""")
def geo_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-radius payload filter (Qdrant geo_radius / ES geo_distance):
    all records within R km of a center, nearest first.

    Scale shape: coordinate derivation, distance, and the radius
    predicate are all map-side expressions in the scan (with real
    stored coordinates the predicate would sit on top of a lat/lon
    min-max-pruned layout — the bounding-box prefilter below); the
    ordered page is TakeOrdered. Zero shuffles."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    d = cust.withColumn("dist_km", planar_km(F.col("lat"), F.col("lon")))
    return (d.where(F.col("dist_km") <= GEO_RADIUS_KM)
             .select("c_custkey", "c_name", "c_mktsegment", "lat", "lon",
                     "dist_km")
             .orderBy("dist_km", "c_custkey").limit(100))


@register("geo_bounding_box", oracle="""
WITH geo AS (
  SELECT c_custkey, c_mktsegment,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer)
SELECT c_mktsegment, count(*) AS n,
       CAST(min(c_custkey) AS BIGINT) AS first_key
FROM geo
WHERE lat BETWEEN 20.0 AND 60.0 AND lon BETWEEN -120.0 AND -30.0
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""")
def geo_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo bounding-box filter + facet rollup (Qdrant geo_bounding_box,
    ES geo_bounding_box aggs): a pure range predicate — the form that
    prunes at file level when the layout is partitioned or z-ordered
    on a geohash/coordinate prefix."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    return (cust.where(F.col("lat").between(20.0, 60.0)
                       & F.col("lon").between(-120.0, -30.0))
                .groupBy("c_mktsegment")
                .agg(F.count("*").alias("n"),
                     F.min("c_custkey").cast("bigint").alias("first_key"))
                .orderBy("c_mktsegment"))


GRID_DEG = 15.0  # grid-cell edge in degrees (geohash_grid analog)


@register("geo_grid_agg", oracle=f"""
WITH geo AS (
  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
cells AS (
  SELECT CAST(floor(lat / {GRID_DEG!r}) AS INT) AS cell_lat,
         CAST(floor(lon / {GRID_DEG!r}) AS INT) AS cell_lon,
         bal
  FROM geo)
SELECT cell_lat, cell_lon,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(bal) AS DOUBLE) AS total_bal
FROM cells GROUP BY cell_lat, cell_lon
ORDER BY n DESC, cell_lat, cell_lon
LIMIT 20
""")
def geo_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo grid aggregation (ES geohash_grid / Qdrant facet-by-area):
    bucket records into fixed-degree cells and roll up per cell — the
    map-tile heat layer. Cell assignment is exact integer-ish floor
    math in the scan; one partial-agg'd groupBy on the (bounded:
    12x24) cell grid; top cells via TakeOrdered. With a layout
    partitioned on the cell prefix this prunes to the viewport's
    files. Money values cast to exact
    DECIMAL(18,2) cents BEFORE summing (order-independent exact
    accumulation on both engines) and surface as double at the edge."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    return (cust.select(
                F.floor(F.col("lat") / GRID_DEG).cast("int").alias("cell_lat"),
                F.floor(F.col("lon") / GRID_DEG).cast("int").alias("cell_lon"),
                F.col("c_acctbal").cast("decimal(18,2)").alias("bal"))
                .groupBy("cell_lat", "cell_lon")
                .agg(F.count("*").alias("n"),
                     F.sum("bal").cast("double").alias("total_bal"))
                .orderBy(F.desc("n"), "cell_lat", "cell_lon")
                .limit(20))


# ------------------------------------------------------- polygon filter

# pentagon (lat, lon) — closed implicitly (last edge wraps to first)
GEO_POLY = [(10.0, -40.0), (45.0, -10.0), (70.0, -60.0),
            (40.0, -110.0), (0.0, -80.0)]


def _poly_edges():
    return [(GEO_POLY[i], GEO_POLY[(i + 1) % len(GEO_POLY)])
            for i in range(len(GEO_POLY))]


def _crossing_sql(lat: str, lon: str) -> str:
    """Ray-casting crossing count as one SQL expression — identical
    literal arithmetic on both engines (+,-,*,/ and comparisons are
    IEEE-exact, so inside/outside needs no tolerance)."""
    terms = []
    for (y1, x1), (y2, x2) in _poly_edges():
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat}) <> ({y2!r} > {lat})) "
            f"AND ({lon} < ({x2!r} - {x1!r}) * ({lat} - {y1!r}) "
            f"/ ({y2!r} - {y1!r}) + {x1!r}) THEN 1 ELSE 0 END)")
    return " + ".join(terms)


@register("geo_polygon_search", oracle=f"""
WITH geo AS (
  SELECT c_custkey, c_mktsegment,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer)
SELECT c_custkey, c_mktsegment, lat, lon
FROM geo
WHERE ({_crossing_sql('lat', 'lon')}) % 2 = 1
ORDER BY c_custkey
LIMIT 100
""")
def geo_polygon_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-polygon payload filter (Qdrant geo_polygon, ES geo_polygon
    — via the client libs the reference installs, /root/reference
    README.md:95): records whose point falls inside an arbitrary
    polygon, by ray casting (odd crossing count = inside).

    Scale shape: the crossing count is a fixed per-edge expression
    chain evaluated map-side in the scan — no join, no shuffle, no
    UDF; the page is TakeOrdered. The SAME generated expression text
    feeds both engines, so inside/outside agrees bit-for-bit with no
    epsilon."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    inside = F.expr(f"({_crossing_sql('lat', 'lon')}) % 2 = 1")
    return (cust.where(inside)
                .select("c_custkey", "c_mktsegment", "lat", "lon")
                .orderBy("c_custkey").limit(100))


RING_EDGES_KM = (1000.0, 2500.0, 5000.0, 10000.0)


def _ring_case_sql(dist: str) -> str:
    whens = " ".join(
        f"WHEN {dist} < {e!r} THEN {i}"
        for i, e in enumerate(RING_EDGES_KM))
    return f"CASE {whens} ELSE {len(RING_EDGES_KM)} END"


@register("geo_distance_rings", oracle=f"""
WITH geo AS (
  SELECT c_custkey, c_acctbal,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
d AS (
  SELECT c_custkey, c_acctbal,
         sqrt(((lon - ({GEO_LON0!r})) * {KM_PER_DEG_LON!r})
              * ((lon - ({GEO_LON0!r})) * {KM_PER_DEG_LON!r})
              + ((lat - {GEO_LAT0!r}) * {KM_PER_DEG_LAT!r})
                * ((lat - {GEO_LAT0!r}) * {KM_PER_DEG_LAT!r})) AS dist_km
  FROM geo)
SELECT CAST({_ring_case_sql('dist_km')} AS INT) AS ring,
       count(*) AS n,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM d GROUP BY 1 ORDER BY 1
""")
def geo_distance_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geo_distance` aggregation: concentric distance rings around
    a center with per-ring count + exact-decimal balance rollup. Ring
    assignment is the same map-side planar distance as the radius
    filter; the agg is a bounded-cardinality partial groupBy (at most
    |edges|+1 rings at any corpus size)."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    d = cust.withColumn("dist_km", planar_km(F.col("lat"), F.col("lon")))
    ring = F.when(F.col("dist_km") < RING_EDGES_KM[0], 0)
    for i, e in enumerate(RING_EDGES_KM[1:], start=1):
        ring = ring.when(F.col("dist_km") < e, i)
    ring = ring.otherwise(len(RING_EDGES_KM))
    return (d.groupBy(ring.cast("int").alias("ring"))
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                   .cast("double").alias("total_bal"))
             .orderBy("ring"))


# ------------------------------------------------- geo_shape envelope

# Query envelope (ES geo_shape `envelope` is [[minLon, maxLat],
# [maxLon, minLat]] — top-left / bottom-right).
GS_Q_MINLAT, GS_Q_MAXLAT = 30.0, 50.0
GS_Q_MINLON, GS_Q_MAXLON = -90.0, -60.0
# Per-customer indexed shape: a service-area box around the point,
# half-extent up to 5 degrees, derived from the key.
_GS_DLAT = "((c_custkey * 31) % 500) / 100.0"
_GS_DLON = "((c_custkey * 17) % 500) / 100.0"


@register("geo_shape_envelope", oracle=f"""
WITH geo AS (
  SELECT c_custkey,
         ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
s AS (
  SELECT c_custkey,
         lat - {_GS_DLAT} AS minlat, lat + {_GS_DLAT} AS maxlat,
         lon - {_GS_DLON} AS minlon, lon + {_GS_DLON} AS maxlon
  FROM geo),
hit AS (
  SELECT * FROM s
  WHERE minlat <= {GS_Q_MAXLAT!r} AND maxlat >= {GS_Q_MINLAT!r}
    AND minlon <= {GS_Q_MAXLON!r} AND maxlon >= {GS_Q_MINLON!r})
SELECT c_custkey,
       round(minlat, 6) AS minlat, round(maxlat, 6) AS maxlat,
       round(minlon, 6) AS minlon, round(maxlon, 6) AS maxlon,
       CASE
         WHEN minlat >= {GS_Q_MINLAT!r} AND maxlat <= {GS_Q_MAXLAT!r}
          AND minlon >= {GS_Q_MINLON!r} AND maxlon <= {GS_Q_MAXLON!r}
           THEN 'WITHIN'
         WHEN minlat <= {GS_Q_MINLAT!r} AND maxlat >= {GS_Q_MAXLAT!r}
          AND minlon <= {GS_Q_MINLON!r} AND maxlon >= {GS_Q_MAXLON!r}
           THEN 'CONTAINS'
         ELSE 'INTERSECTS'
       END AS relation
FROM hit ORDER BY c_custkey LIMIT 50
""")
def geo_shape_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geo_shape` query with an `envelope` against INDEXED SHAPES
    (boxes, not points — the surface geo_bounding_box can't serve):
    every customer carries a service-area box; the query envelope
    returns each intersecting shape classified by its actual spatial
    relation (WITHIN / CONTAINS / INTERSECTS — the three ES
    `relation` modes, decided per hit like the BKD tree reports).

    Scale shape: the intersection test is the separating-axis
    interval overlap — four sargable comparisons on the box-bound
    columns, map-side in the scan; on a corpus laid out by a
    space-filling curve over (minlat, minlon) those predicates become
    row-group pruning (the parquet min/max twin of Lucene's BKD
    tree), so an envelope query reads only the overlapping stripe of
    a 100 TB shape table. Relation classification is branch-free
    column math on the hits only; no join, no shuffle before the
    bounded ORDER BY."""
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    dlat = ((F.col("c_custkey") * 31) % 500) / 100.0
    dlon = ((F.col("c_custkey") * 17) % 500) / 100.0
    s = cust.select(
        "c_custkey",
        (F.col("lat") - dlat).alias("minlat"),
        (F.col("lat") + dlat).alias("maxlat"),
        (F.col("lon") - dlon).alias("minlon"),
        (F.col("lon") + dlon).alias("maxlon"))
    hit = s.where((F.col("minlat") <= GS_Q_MAXLAT)
                  & (F.col("maxlat") >= GS_Q_MINLAT)
                  & (F.col("minlon") <= GS_Q_MAXLON)
                  & (F.col("maxlon") >= GS_Q_MINLON))
    within = ((F.col("minlat") >= GS_Q_MINLAT)
              & (F.col("maxlat") <= GS_Q_MAXLAT)
              & (F.col("minlon") >= GS_Q_MINLON)
              & (F.col("maxlon") <= GS_Q_MAXLON))
    contains = ((F.col("minlat") <= GS_Q_MINLAT)
                & (F.col("maxlat") >= GS_Q_MAXLAT)
                & (F.col("minlon") <= GS_Q_MINLON)
                & (F.col("maxlon") >= GS_Q_MAXLON))
    rel = (F.when(within, "WITHIN")
            .when(contains, "CONTAINS")
            .otherwise("INTERSECTS"))
    return (hit.select("c_custkey",
                       F.round("minlat", 6).alias("minlat"),
                       F.round("maxlat", 6).alias("maxlat"),
                       F.round("minlon", 6).alias("minlon"),
                       F.round("maxlon", 6).alias("maxlon"),
                       rel.alias("relation"))
               .orderBy("c_custkey").limit(50))
