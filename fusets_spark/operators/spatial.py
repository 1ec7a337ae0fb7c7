"""Spatial grid operators (SURVEY.md §2.2/§2.5): focal window statistics
and polygon masking — the two reference capabilities that need an (x, y)
grid rather than a time axis.

focal_stats mirrors the reference's NaN-aware speckle filter (reference
improved_s1_ndvi_fusion_v2.py:46-97 `compute_spatial_features`): mean and
population std over the (2r+1)² neighborhood, normalized by the VALID
neighbor count (the reference's count_valid division). Edge cells use the
neighbors that exist (valid-count semantics) where the reference's
uniform_filter mirror-pads — identical in the interior of a full grid,
documented divergence at the border of the grid itself.

Plan shape (scale): each cell emits its (2r+1)² target contributions
map-side (literal offset explode — no self-join, no skew), then ONE
partial+final aggregation on the target cell key. 9× map amplification for
r=1, zero extra shuffles beyond the single groupBy.

polygon_mask implements the openEO `mask_polygon` step (reference
openeo/services/publish_mogpr_s1_s2.py:86,122,138,170) as a native
ray-casting expression over a literal vertex list — fully JVM-side and
SQL-mirrorable. Polygons must have no exactly-horizontal edges (guard
against the division in the crossing test; pre-split such edges upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def focal_stats(
    grid: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    radius: int = 1,
) -> DataFrame:
    """NaN-aware focal mean/std over the (2r+1)² neighborhood of each cell
    present in `grid`. Output: (x, y, n_nbr, f_mean, f_std)."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
        ]
    )
    # F.count/F.sum skip NULLs, not NaNs — null-out NaN doubles first so an
    # actual NaN cell neither inflates n_nbr nor poisons f_mean/f_std
    # (matches the reference's nan-masked count_valid division)
    v = F.col(value_col)
    valid = F.when(~F.isnan(v), v) if dict(grid.dtypes)[value_col] in (
        "double", "float"
    ) else v
    contrib = grid.select(
        F.col(x_col).alias("_sx"),
        F.col(y_col).alias("_sy"),
        valid.alias("_v"),
        F.explode(offsets).alias("_o"),
    ).select(
        (F.col("_sx") + F.col("_o.dx")).alias("x"),
        (F.col("_sy") + F.col("_o.dy")).alias("y"),
        F.col("_v"),
    )
    stats = contrib.groupBy("x", "y").agg(
        F.count("_v").alias("n_nbr"),
        F.sum("_v").alias("_sum"),
        F.sum(F.col("_v") * F.col("_v")).alias("_sumsq"),
    )
    mean = F.col("_sum") / F.col("n_nbr")
    # reference formula: sqrt(max(E[v²] − mean², 0)) over valid neighbors
    var = F.greatest(F.col("_sumsq") / F.col("n_nbr") - mean * mean, F.lit(0.0))
    # keep only cells that exist in the input grid (targets outside it get
    # contributions too; semi-join restores the reference's output domain)
    cells = grid.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).distinct()
    return (
        stats.join(cells, ["x", "y"], "left_semi")
        .withColumn("f_mean", mean)
        .withColumn("f_std", F.sqrt(var))
        .select("x", "y", "n_nbr", "f_mean", "f_std")
    )


def point_in_polygon(
    x: Column, y: Column, polygon: list[tuple[float, float]]
) -> Column:
    """Ray-casting point-in-polygon as one native expression: count edges
    whose span crosses the horizontal ray; odd ⇒ inside. Vertices are plan
    literals. Requires no exactly-horizontal edges (the crossing test's
    division is guarded by the span check, which a horizontal edge fails —
    but under ANSI we do not rely on short-circuit evaluation)."""
    n = len(polygon)
    assert n >= 3, "polygon needs at least 3 vertices"
    edges = []
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        assert y1 != y2, "horizontal edge: pre-split it (division guard)"
        edges.append(
            F.struct(
                F.lit(float(x1)).alias("x1"),
                F.lit(float(y1)).alias("y1"),
                F.lit(float(x2)).alias("x2"),
                F.lit(float(y2)).alias("y2"),
            )
        )

    def vote(e: Column) -> Column:
        spans = (e["y1"] > y) != (e["y2"] > y)
        xcross = (
            (e["x2"] - e["x1"]) * (y - e["y1"]) / (e["y2"] - e["y1"]) + e["x1"]
        )
        return F.when(spans & (x < xcross), 1).otherwise(0)

    crossings = F.aggregate(
        F.array(*edges), F.lit(0), lambda acc, e: acc + vote(e)
    )
    return F.pmod(crossings, F.lit(2)) == 1


def polygon_mask(
    df: DataFrame,
    polygon: list[tuple[float, float]],
    x_col: str = "x",
    y_col: str = "y",
    keep_inside: bool = True,
) -> DataFrame:
    """Filter rows by polygon membership of (x_col, y_col)."""
    inside = point_in_polygon(
        F.col(x_col).cast("double"), F.col(y_col).cast("double"), polygon
    )
    return df.filter(inside if keep_inside else ~inside)
