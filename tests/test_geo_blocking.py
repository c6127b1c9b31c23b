"""Latitude-aware grid blocking: the cos(lat)-widened longitude
fan-out must find high-latitude pairs that a fixed 3x3 scheme drops,
and must agree with an unblocked brute-force haversine on crafted
points across the latitude range."""

from __future__ import annotations

import math

from mapreduce_sssp_spark.operators.geo import (
    EARTH_R_M,
    GEO_RADIUS_M,
    blocked_pairs,
)


def _hav_m(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(
        dl / 2
    ) ** 2
    return round(2 * EARTH_R_M * math.asin(math.sqrt(a)))


def _pts_df(spark, pts):
    rows = [
        (pid, lat, lon, math.floor(lat + 85), math.floor(lon + 179))
        for pid, lat, lon in pts
    ]
    return spark.createDataFrame(
        rows, "pid long, lat double, lon double, cell_lat long, cell_lon long"
    )


def test_high_latitude_pair_two_cells_apart(spark):
    # At 78N, 1.9 deg of longitude is ~44 km (< 50 km radius) but spans
    # TWO cell boundaries (lons 0.95 and 2.85 land in cells 179 and
    # 181) — a fixed +-1 column fan-out can never join them.
    pts = [(1, 78.0, 0.95), (2, 78.0, 2.85)]
    assert _hav_m(*pts[0][1:], *pts[1][1:]) <= GEO_RADIUS_M
    got = {
        (r.a_id, r.b_id): r.dist_m
        for r in blocked_pairs(_pts_df(spark, pts)).collect()
    }
    assert got == {(1, 2): _hav_m(78.0, 0.95, 78.0, 2.85)}


def test_blocking_matches_bruteforce_across_latitudes(spark):
    # Clusters at low, mid, high latitude plus scattered singletons:
    # the blocked join must return exactly the brute-force pair set.
    import random

    rng = random.Random(20260815)
    pts = []
    pid = 0
    for base_lat, base_lon in ((0.0, 10.0), (55.0, 40.0), (80.0, 100.0)):
        for _ in range(12):
            pid += 1
            pts.append(
                (
                    pid,
                    base_lat + rng.uniform(-0.4, 0.4),
                    base_lon + rng.uniform(-2.5, 2.5),
                )
            )
    for _ in range(10):  # far-apart noise, no pairs expected
        pid += 1
        pts.append((pid, rng.uniform(-60, 60), rng.uniform(-170, 170)))
    want = {}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            d = _hav_m(a[1], a[2], b[1], b[2])
            if d <= GEO_RADIUS_M:
                key = (min(a[0], b[0]), max(a[0], b[0]))
                want[key] = d
    got = {
        (r.a_id, r.b_id): r.dist_m
        for r in blocked_pairs(_pts_df(spark, pts)).collect()
    }
    assert got == want
    assert want, "crafted clusters must actually produce pairs"
