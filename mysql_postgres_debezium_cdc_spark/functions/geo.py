"""Geospatial scalar surface: haversine distance + k-nearest search.

The fixture schema carries no coordinates, so customer locations are
DERIVED deterministically from the key (modular arithmetic on
c_custkey — exact integers → exact doubles in both engines), the same
synthesize-from-key device `fn_url_parse`'s fixture uses.  What is
under test is the geo operator itself: the haversine great-circle
formula and the broadcast-queries × streamed-scan top-k shape shared
with `ann_bruteforce_topk` (a geo k-NN IS an ANN query at dimension 2).

Float parity: lat/lon derive exactly; the trig tree is fixed and both
engines' libm implementations agree to ≤1 ulp, far inside the 4dp
rounding of the output distance; ranking ties break by c_custkey.

Scale notes (100 TB): queries broadcast; the scan is one narrow pass;
per-query top-k is a window over the (|Q| × k-candidates) relation.
A real planet-scale nearest-neighbor service would add a geohash
bucket prefilter (the `ann_lsh_topk` device at dimension 2) — the
brute-force path here is the exactness baseline that eval would
score against, exactly as `ann_ivf_recall_eval` does for embeddings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

EARTH_RADIUS_KM = 6371.0088
GEO_TOP_K = 3
# five query points spanning the synthetic coordinate space
GEO_QUERIES = ((0, -60.0, -150.0), (1, -30.0, -60.0), (2, 0.0, 0.0),
               (3, 30.0, 60.0), (4, 60.0, 150.0))


def _geo_queries_sql() -> str:
    vals = ", ".join(f"({q}, {la}, {lo})" for q, la, lo in GEO_QUERIES)
    return f"(VALUES {vals}) AS q(q_id, q_lat, q_lon)"


@register(
    "geo_haversine_knn",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey,
             (c_custkey * 7919 % 18000) / 100.0 - 90.0   AS lat,
             (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon
      FROM customer
    ),
    dists AS (
      SELECT q.q_id, c.c_custkey,
             2 * {EARTH_RADIUS_KM} * ASIN(SQRT(
               POWER(SIN(RADIANS(c.lat - q.q_lat) / 2), 2)
               + COS(RADIANS(q.q_lat)) * COS(RADIANS(c.lat))
                 * POWER(SIN(RADIANS(c.lon - q.q_lon) / 2), 2)
             )) AS dist_km
      FROM cust c CROSS JOIN {_geo_queries_sql()}
    ),
    ranked AS (
      SELECT q_id, c_custkey, dist_km,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY dist_km, c_custkey) AS rnk
      FROM dists
    )
    SELECT q_id, rnk, c_custkey, ROUND(dist_km, 4) AS dist_km
    FROM ranked WHERE rnk <= {GEO_TOP_K}
    ORDER BY q_id, rnk
    """,
    tags=("geo", "knn", "function"),
)
def geo_haversine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest customers to each query point by haversine
    great-circle distance (store-locator / dispatch assignment — the
    standard geo query a warehouse answers without a geo index).

    Plan shape: the 5-row query relation broadcasts onto one customer
    scan (narrow cross join — |C|×|Q| rows with |Q| constant), then a
    per-query ROW_NUMBER window takes the top k; distance ties break
    by c_custkey so the cut is total-ordered."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )
    queries = spark.createDataFrame(
        list(GEO_QUERIES), "q_id int, q_lat double, q_lon double"
    )
    rad = F.radians
    dist = (
        2
        * EARTH_RADIUS_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(rad(F.col("lat") - F.col("q_lat")) / 2), 2)
                + F.cos(rad("q_lat"))
                * F.cos(rad("lat"))
                * F.pow(F.sin(rad(F.col("lon") - F.col("q_lon")) / 2), 2)
            )
        )
    )
    dists = cust.crossJoin(F.broadcast(queries)).select(
        "q_id", "c_custkey", dist.alias("dist_km")
    )
    ranked = dists.select(
        "q_id",
        "c_custkey",
        "dist_km",
        F.row_number()
        .over(Window.partitionBy("q_id").orderBy("dist_km", "c_custkey"))
        .alias("rnk"),
    )
    return (
        ranked.where(F.col("rnk") <= GEO_TOP_K)
        .select("q_id", "rnk", "c_custkey", F.round("dist_km", 4).alias("dist_km"))
        .orderBy("q_id", "rnk")
    )
