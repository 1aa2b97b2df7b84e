"""Geo-spatial proximity join via 2D grid-cell binning.

The reference enriches records with coordinates (T1 geocode,
`Services/DataflowProcessor.cs:150-170`); the natural follow-on query
— "which records are near each other" — is an all-pairs distance join,
O(n²) at scale. This operator applies the binned-equi-join rewrite
(`join_range_binned`'s trick, in two dimensions): hash every point to
a grid cell sized by the search radius, replicate ONE side into its 3x3
neighbor cells, equi-join on the cell id, and keep the true distance
predicate as a residual filter. Each true pair shares at least one of
the 9 cells, and exactly one (cells are distinct), so results are
exact with work proportional to cell collisions, not n².

Distance is squared-euclidean in degrees — pure +/*/- arithmetic, so
the result hash-matches the oracle (haversine's trig is NOT guaranteed
bit-identical across engines; swap it in for production accuracy, as
noted below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import ZIP_DETAILS_PATH
from ..plans.registry import register

_RADIUS_DEG = 1.0  # search radius == grid cell edge


@register(
    "geo_distance_join",
    oracle=f"""
    SELECT a.CompositeKey AS key_a, b.CompositeKey AS key_b,
           (a.Latitude - b.Latitude) * (a.Latitude - b.Latitude)
           + (a.Longitude - b.Longitude) * (a.Longitude - b.Longitude) AS dist2
    FROM read_parquet('{ZIP_DETAILS_PATH}') a
    JOIN read_parquet('{ZIP_DETAILS_PATH}') b
      ON a.CompositeKey < b.CompositeKey
     AND (a.Latitude - b.Latitude) * (a.Latitude - b.Latitude)
         + (a.Longitude - b.Longitude) * (a.Longitude - b.Longitude)
         < {_RADIUS_DEG * _RADIUS_DEG}
    ORDER BY key_a, key_b
    """,
)
def geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs of geocoded records within a radius, computed as a
    grid-binned HASH join instead of the oracle's all-pairs nested
    loop.

    Scale shape: one side is replicated 9x (its 3x3 neighbor cells) —
    a constant fan-out — then the join is a plain equi hash join on
    the cell id; candidate pairs are only same-cell collisions. The
    residual squared-distance filter keeps exactness. At planetary
    densities, shrink the cell edge below the radius (cell lists stay
    bounded) — the rewrite holds as long as radius <= cell edge.
    """
    z = spark.read.parquet(ZIP_DETAILS_PATH).select(
        "CompositeKey", "Latitude", "Longitude"
    )
    cell = lambda c: F.floor(F.col(c) / _RADIUS_DEG).cast("long")  # noqa: E731
    probe = z.select(
        F.col("CompositeKey").alias("key_a"),
        F.col("Latitude").alias("lat_a"),
        F.col("Longitude").alias("lon_a"),
        cell("Latitude").alias("cx"),
        cell("Longitude").alias("cy"),
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    build = (
        z.select(
            F.col("CompositeKey").alias("key_b"),
            F.col("Latitude").alias("lat_b"),
            F.col("Longitude").alias("lon_b"),
        )
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "key_b",
            "lat_b",
            "lon_b",
            (F.floor(F.col("lat_b") / _RADIUS_DEG).cast("long") + F.col("dx")).alias("cx"),
            (F.floor(F.col("lon_b") / _RADIUS_DEG).cast("long") + F.col("dy")).alias("cy"),
        )
    )
    dlat = F.col("lat_a") - F.col("lat_b")
    dlon = F.col("lon_a") - F.col("lon_b")
    dist2 = dlat * dlat + dlon * dlon
    return (
        probe.join(
            build,
            (probe["cx"] == build["cx"])
            & (probe["cy"] == build["cy"])
            & (F.col("key_a") < F.col("key_b"))
            & (dist2 < F.lit(_RADIUS_DEG * _RADIUS_DEG)),
        )
        .select("key_a", "key_b", dist2.alias("dist2"))
        .orderBy("key_a", "key_b")
    )
