"""Rotated-rectangle fit (from_rr, pd_vtk.py:705-724) — pure-numpy
rotating calipers over a distributed (mapInPandas per-partition) convex
hull, replacing shapely's minimum_rotated_rectangle."""

from __future__ import annotations

import math

import numpy as np
import pytest

from vtk_reserves_spark.sources.grid import (
    grid_from_rr,
    minimum_rotated_rectangle,
)


def _rot_rect_points(theta_deg: float, w: float, h: float, ox: float, oy: float):
    th = math.radians(theta_deg)
    pts = []
    for u in np.arange(0.0, w + 1e-9, 5.0):
        for v in np.arange(0.0, h + 1e-9, 5.0):
            pts.append(
                (
                    ox + u * math.cos(th) - v * math.sin(th),
                    oy + u * math.sin(th) + v * math.cos(th),
                )
            )
    return np.array(pts)


def test_minimum_rotated_rectangle_recovers_rect():
    pts = _rot_rect_points(30.0, 100.0, 50.0, 1000.0, 2000.0)
    corner, (w, h), theta = minimum_rotated_rectangle(pts)
    assert w * h == pytest.approx(5000.0, rel=1e-6)
    assert sorted([round(w), round(h)]) == [50, 100]
    # recovered direction is the rectangle's 30° frame modulo 90°
    assert math.degrees(theta) % 90 == pytest.approx(30.0, abs=1e-6)


def test_grid_from_rr_covers_points(spark):
    pts = _rot_rect_points(30.0, 100.0, 50.0, 1000.0, 2000.0)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    gs = grid_from_rr(df, cell_size=5.0)
    assert gs.rotated
    area = gs.dims[0] * gs.spacing[0] * gs.dims[1] * gs.spacing[1]
    assert area == pytest.approx(5000.0, rel=0.05)
    # every source point maps into the grid's local frame footprint
    lx, ly = [], []
    th = gs.theta
    rx, ry = gs.rot_origin[:2]
    for x, y in pts:
        lx.append(rx + math.cos(th) * (x - rx) + math.sin(th) * (y - ry))
        ly.append(ry - math.sin(th) * (x - rx) + math.cos(th) * (y - ry))
    w = gs.dims[0] * gs.spacing[0]
    h = gs.dims[1] * gs.spacing[1]
    assert min(lx) >= rx - 1e-6 and max(lx) <= rx + w + 1e-6
    assert min(ly) >= ry - 1e-6 and max(ly) <= ry + h + 1e-6
