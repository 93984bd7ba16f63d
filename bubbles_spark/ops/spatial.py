"""Grid-bucketed proximity joins.

A distance self-join ("all pairs within radius r") is a theta join —
quadratic if expressed naively.  The scalable shape is the classic
spatial-binning plan: hash every point into a square grid cell of
side ``r``, explode ONE side into its 3×3 cell neighborhood, and
equi-join on the cell key — any pair within ``r`` must land in
neighboring cells, so the equi-join is a complete candidate set and
the exact distance predicate only runs on candidates.

Reference scope: Stiivi/bubbles has no spatial ops; this is §2.14
extension surface (SURVEY.md) sharing the banded-join discipline of
``core.range_join`` / ``imagehash``'s hamming join: bucket → equi-join
→ verify, never a cartesian.

Exactness: with integer (or exact-decimal) coordinates the squared
distance is pure integer arithmetic — bit-reproducible; with double
coordinates it is a fixed IEEE sequence.  Cell assignment uses
``floor(x / cell)`` which both engines evaluate identically for
integer inputs under the 2^53 budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_distance_join"]


def grid_distance_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All point pairs within ``radius`` (Euclidean), as
    ``(id_a, id_b, dist_sq)`` with ``id_a < id_b``.

    Plan: cell side = ``radius`` → each point's neighbors live in the
    surrounding 3×3 cells.  The LEFT copy explodes into those 9 cell
    keys (bounded ×9 fan-out of the skinny (id,x,y) projection — the
    payload never fans out), the RIGHT copy keeps its single home
    cell, and the candidate set is one equi-join on
    ``(cell_x, cell_y)``.  Each qualifying pair matches exactly once
    (the right point's home cell is unique), so no dedup pass is
    needed.  The ``id_a < id_b`` orientation also halves the verify
    work.

    Skew: a cell holding m points contributes O(m²) candidates — the
    same degenerate case as every banded join in this repo
    (``imagehash`` bands, ``dedup`` LSH buckets).  If your data piles
    into one cell, shrink ``radius``'s cell granularity by
    pre-scaling coordinates, or pre-aggregate duplicate locations.

    Output: id_a, id_b, dist_sq (exact for integer coords).
    """
    if radius <= 0:
        raise ValueError("grid_distance_join: radius must be positive")
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        F.floor(F.col(x_col) / radius).alias("__cx"),
        F.floor(F.col(y_col) / radius).alias("__cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("__id").alias("__ida"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.explode(offsets).alias("__o"),
        "__cx",
        "__cy",
    ).select(
        "__ida",
        "__xa",
        "__ya",
        (F.col("__cx") + F.col("__o.dx")).alias("__cx"),
        (F.col("__cy") + F.col("__o.dy")).alias("__cy"),
    )
    dx = F.col("__xa") - F.col("__x")
    dy = F.col("__ya") - F.col("__y")
    dist_sq = dx * dx + dy * dy
    r_sq = F.lit(radius) * F.lit(radius)
    return (
        left.join(pts, ["__cx", "__cy"])
        .filter(F.col("__ida") < F.col("__id"))
        .filter(dist_sq <= r_sq)
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__id").alias("id_b"),
            dist_sq.alias("dist_sq"),
        )
    )
