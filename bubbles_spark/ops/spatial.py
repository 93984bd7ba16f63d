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

__all__ = ["grid_distance_join", "haversine_join"]


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


def haversine_join(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """All point pairs within ``radius_km`` great-circle kilometres
    (haversine, mean Earth radius 6371.0088 km), as ``(id_a, id_b,
    lat/lon of both, dist_km)`` with ``id_a < id_b`` — geo proximity
    without PostGIS.

    Plan: the same bucket → equi-join → verify shape as
    ``grid_distance_join``, on a lat/lon grid.  The latitude cell is
    ``radius/110.5`` degrees (one meridian degree is ≥ 110.57 km
    everywhere, so the cell over-covers); the longitude cell divides
    further by ``cos(max_abs_lat)`` — the worst shrink the data is
    allowed to reach.  Points with ``|lat| > max_abs_lat`` are
    DROPPED (documented contract: polar-band data needs a polar
    projection, not wider and wider lon bands); raise the cap if
    your data is sub-polar, at a bounded candidate-fanout cost.

    Exactness: the membership predicate is ``hav(pair) ≤
    sin²(radius/2R)`` where the RIGHT side is computed ONCE in
    Python and injected as the same double literal into any mirror
    plan (the Benford expected-share discipline); the left side
    crosses sin/cos whose last ulp is engine-specific, so mirrors
    should compare pair identity (+ exact coordinates) and pin
    ``dist_km`` values in unit tests — the ``psi_bin``/``pmi``
    policy.  A pair flips membership only if its haversine term
    lands within ~1 ulp of the threshold.

    Scale: ×9 fan-out of the skinny (id, lat, lon) projection on one
    side only; candidate skew is cell occupancy² exactly as
    ``grid_distance_join`` documents.

    Output: id_a, id_b, lat_a, lon_a, lat_b, lon_b, dist_km."""
    import math

    if radius_km <= 0:
        raise ValueError("haversine_join: radius_km must be positive")
    if not 0 < max_abs_lat < 89.0:
        raise ValueError("haversine_join: max_abs_lat must be in (0, 89)")
    R = 6371.0088
    cell_lat = radius_km / 110.5
    cell_lon = cell_lat / math.cos(math.radians(max_abs_lat))
    # the longitude grid must WRAP at the antimeridian (±180 are the
    # same meridian — a seam, not an edge): snap the cell width UP to
    # divide 360 evenly and index cells modulo n_lon, so a point at
    # lon 179.9 and one at −179.9 land in adjacent (wrapped) cells.
    n_lon = int(360.0 // cell_lon)
    if n_lon < 3:
        raise ValueError(
            "haversine_join: radius_km too large for longitude banding "
            f"(needs >= 3 wrapped cells, got {n_lon}); use a brute-force "
            "pair join at this radius"
        )
    cell_lon = 360.0 / n_lon
    h_thresh = math.sin(radius_km / (2.0 * R)) ** 2

    pts = df.filter(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & (F.abs(F.col(lat_col)) <= max_abs_lat)
    ).select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).cast("double").alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
        F.floor(F.col(lat_col) / cell_lat).alias("__cx"),
        F.pmod(
            F.floor((F.col(lon_col) + 180.0) / cell_lon), F.lit(n_lon)
        ).alias("__cy"),
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
        F.col("__lat").alias("__lata"),
        F.col("__lon").alias("__lona"),
        F.explode(offsets).alias("__o"),
        "__cx",
        "__cy",
    ).select(
        "__ida",
        "__lata",
        "__lona",
        (F.col("__cx") + F.col("__o.dx")).alias("__cx"),
        F.pmod(F.col("__cy") + F.col("__o.dy"), F.lit(n_lon)).alias("__cy"),
    )
    dphi = F.radians(F.col("__lat") - F.col("__lata")) / 2.0
    dlam = F.radians(F.col("__lon") - F.col("__lona")) / 2.0
    hav = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(F.col("__lata")))
        * F.cos(F.radians(F.col("__lat")))
        * F.sin(dlam)
        * F.sin(dlam)
    )
    return (
        left.join(pts, ["__cx", "__cy"])
        .filter(F.col("__ida") < F.col("__id"))
        .filter(hav <= F.lit(h_thresh))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__id").alias("id_b"),
            F.col("__lata").alias("lat_a"),
            F.col("__lona").alias("lon_a"),
            F.col("__lat").alias("lat_b"),
            F.col("__lon").alias("lon_b"),
            (
                F.lit(2.0 * R)
                * F.asin(F.sqrt(F.least(hav, F.lit(1.0))))
            ).alias("dist_km"),
        )
    )
