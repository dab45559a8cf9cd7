"""Geospatial operators (EXT mandate — round 6).

The reference has no geo capability; this module adds the canonical
distributed-geo primitive a logistics/assignment pipeline needs: nearest-
neighbour point joins WITHOUT an all-pairs cross join, via integer grid
bucketing (the poor man's S2/H3 — same 3×3-neighbourhood probe shape, so
swapping in a real cell library changes one expression).

Determinism: coordinates in the demo queries derive from integer keys
(exact doubles); haversine is one fixed-shape IEEE expression per pair
(sin/cos/asin match across engines at far better than the whole-meter
quantization used for selection); argmin is a struct-min over
(round-to-meter distance, candidate id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window  # noqa: F401
from pyspark.sql import functions as F

#: mean Earth radius (IUGG), metres — inline in oracles as 6371008.8
_EARTH_R_M = 6_371_008.8


def haversine_m(lat1: Column, lon1: Column, lat2: Column,
                lon2: Column) -> Column:
    """Great-circle distance in metres — one codegen expression."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lon2 - lon1) / 2
    a = (F.sin(dp) * F.sin(dp)
         + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl))
    return F.lit(2.0 * _EARTH_R_M) * F.asin(F.sqrt(a))


def grid_nearest(points: DataFrame, sites: DataFrame, cell_deg: float,
                 pid: str = "pid", sid: str = "sid",
                 lat: str = "lat", lon: str = "lon") -> DataFrame:
    """EXT (round 6): nearest-site assignment via grid bucketing — each
    point joins only sites in its own and the 8 neighbouring
    ``cell_deg``-degree cells, then a struct-min picks the closest by
    whole-metre haversine (site-id ties ascending). Points with no
    site in the 3×3 neighbourhood report NULLs — the DOCUMENTED
    contract (a site just beyond the neighbourhood is not searched;
    pick ``cell_deg`` ≥ the service radius you care about).

    Scale: sites explode ×9 (one row per neighbouring cell — the
    small side, broadcast), points shuffle nowhere; the join is
    hash-equi on the integer cell key. This is the S2/H3 cover-join
    shape with a trivial cell function."""
    cx = F.floor(F.col(lat) / cell_deg).cast("long")
    cy = F.floor(F.col(lon) / cell_deg).cast("long")
    p = points.select(F.col(pid).alias("__pid"),
                      F.col(lat).alias("__plat"),
                      F.col(lon).alias("__plon"),
                      cx.alias("__cx"), cy.alias("__cy"))
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in offs])).alias("__o")
    s = (sites.select(F.col(sid).alias("__sid"),
                      F.col(lat).alias("__slat"),
                      F.col(lon).alias("__slon"),
                      cx.alias("__sx"), cy.alias("__sy"))
         .select("*", off)
         .select("__sid", "__slat", "__slon",
                 (F.col("__sx") + F.col("__o.dx")).alias("__gx"),
                 (F.col("__sy") + F.col("__o.dy")).alias("__gy")))
    dist_m = F.round(haversine_m(F.col("__plat"), F.col("__plon"),
                                 F.col("__slat"), F.col("__slon"))) \
              .cast("long")
    cand = (p.join(F.broadcast(s), (F.col("__cx") == F.col("__gx"))
                   & (F.col("__cy") == F.col("__gy")))
            .select("__pid", F.struct(
                dist_m.alias("dm"), F.col("__sid").alias("si"))
                .alias("__c")))
    best = cand.groupBy(F.col("__pid").alias("__bp")) \
               .agg(F.min("__c").alias("__b"))
    return (p.join(best, F.col("__pid") == F.col("__bp"), "left")
            .select(F.col("__pid").alias(pid),
                    F.col("__b.si").alias("nearest_" + sid),
                    F.col("__b.dm").alias("distance_m")))


def cell_density(points: DataFrame, cell_deg: float,
                 lat: str = "lat", lon: str = "lon", top: int = 10,
                 round_dp: int = 6) -> DataFrame:
    """EXT (round 6): grid-cell density map — the top-``top`` densest
    cells with point count and mean position. The heatmap/hot-zone
    primitive (and the load-balancing input for choosing ``cell_deg``
    in `grid_nearest`: a cell holding 30% of points needs a finer
    grid).

    Determinism: callers pass coordinates with FIXED decimal
    precision (the demo uses 2-decimal pseudo-geo), so lat·100 is an
    exact integer and the centroid is an exact integer sum over one
    division — no float accumulation. Top-k by (count desc, cell
    asc) via TakeOrdered."""
    cx = F.floor(F.col(lat) / cell_deg).cast("long")
    cy = F.floor(F.col(lon) / cell_deg).cast("long")
    lat100 = F.round(F.col(lat) * 100).cast("long")
    lon100 = F.round(F.col(lon) * 100).cast("long")
    per = (points.select(cx.alias("cell_x"), cy.alias("cell_y"),
                         lat100.alias("__la"), lon100.alias("__lo"))
           .groupBy("cell_x", "cell_y")
           .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                F.sum("__la").alias("__sla"),
                F.sum("__lo").alias("__slo")))
    return (per.select(
        "cell_x", "cell_y", "n_points",
        F.round(F.col("__sla").cast("double")
                / (F.col("n_points") * 100).cast("double"), round_dp)
        .alias("mean_lat"),
        F.round(F.col("__slo").cast("double")
                / (F.col("n_points") * 100).cast("double"), round_dp)
        .alias("mean_lon"))
        .orderBy(F.col("n_points").desc(), F.col("cell_x").asc(),
                 F.col("cell_y").asc())
        .limit(top))


def pairs_within(points: DataFrame, radius_m: float, cell_deg: float,
                 pid: str = "pid", lat: str = "lat",
                 lon: str = "lon") -> DataFrame:
    """EXT (round 6): all point pairs within ``radius_m`` — the spatial
    self-join (co-location / duplicate-venue detection), grid-bucketed
    so it never goes all-pairs: side A explodes into its 3×3
    neighbourhood, side B joins on its own cell, so every qualifying
    pair is found EXACTLY once (B's cell matches exactly one of A's
    nine), deduped by id order. Pick ``cell_deg`` so one cell spans
    the radius at your worst latitude (longitude degrees shrink by
    cos(lat) — at |lat| ≤ 60° a degree is ≥ 55.6 km); the contract is
    the same neighbourhood bound as `grid_nearest`.

    Output: (pid_a, pid_b, distance_m), whole metres.

    r11 (guide §2.3 — shuffle/score fewer candidate rows): side A
    explodes into the HALF neighbourhood (own cell + 4 forward
    offsets) instead of all 9 — the backward 4 are the forward 4
    mirrored, so every unordered adjacent cell pair still meets
    exactly once (same-cell pairs keep the id-order filter; cross-cell
    orientation is arbitrary, so ids normalize via least/greatest).
    ~45% fewer candidate rows through the join and the haversine.
    The distance operands are picked BY ID ORDER (smaller-id point
    first) — the exact operand order of the 3×3 form, so the rounded
    metres are bit-identical."""
    cx = F.floor(F.col(lat) / cell_deg).cast("long")
    cy = F.floor(F.col(lon) / cell_deg).cast("long")
    offs = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in offs])).alias("__o")
    a = (points.select(F.col(pid).alias("__pa"),
                       F.col(lat).alias("__ala"),
                       F.col(lon).alias("__alo"),
                       cx.alias("__ax"), cy.alias("__ay"))
         .select("*", off)
         .select("__pa", "__ala", "__alo",
                 (F.col("__ax") + F.col("__o.dx")).alias("__gx"),
                 (F.col("__ay") + F.col("__o.dy")).alias("__gy"),
                 ((F.col("__o.dx") == 0) & (F.col("__o.dy") == 0))
                 .alias("__same")))
    b = points.select(F.col(pid).alias("__pb"),
                      F.col(lat).alias("__bla"),
                      F.col(lon).alias("__blo"),
                      cx.alias("__bx"), cy.alias("__by"))
    lead = F.col("__pa") < F.col("__pb")
    la1 = F.when(lead, F.col("__ala")).otherwise(F.col("__bla"))
    lo1 = F.when(lead, F.col("__alo")).otherwise(F.col("__blo"))
    la2 = F.when(lead, F.col("__bla")).otherwise(F.col("__ala"))
    lo2 = F.when(lead, F.col("__blo")).otherwise(F.col("__alo"))
    dist = F.round(haversine_m(la1, lo1, la2, lo2)).cast("long")
    return (a.join(b, (F.col("__gx") == F.col("__bx"))
                   & (F.col("__gy") == F.col("__by"))
                   & (~F.col("__same") | (F.col("__pa") < F.col("__pb"))))
            .select(F.least("__pa", "__pb").alias(pid + "_a"),
                    F.greatest("__pa", "__pb").alias(pid + "_b"),
                    dist.alias("distance_m"))
            .filter(F.col("distance_m") <= radius_m))
