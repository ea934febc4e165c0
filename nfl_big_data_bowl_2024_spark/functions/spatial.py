"""Scalar column functions (SURVEY §2.7 F1-F3).

All JVM-side built-ins — these stay inside whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def euclidean_dist(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """F1 — sqrt(dx^2 + dy^2) (reference optimal_pursuit.py:217-219).
    ``hypot`` is a single codegen'd JVM intrinsic and numerically safer than
    sqrt(pow+pow) for large components."""
    return F.hypot(x1 - x2, y1 - y2)


def heading_wrap_deg(deg: Column) -> Column:
    """F2 — wrap a compass heading in degrees to (-180, 180]
    (reference optimal_pursuit.py:274-275: deg->rad, atan2(sin, cos), rad->deg)."""
    rad = F.radians(deg)
    return F.degrees(F.atan2(F.sin(rad), F.cos(rad)))


def velocity_components(speed: Column, dir_deg: Column) -> tuple[Column, Column]:
    """F2 — decompose speed + compass direction into (u, v) = (V sin th, V cos th)
    (reference optimal_pursuit.py:276-277). NFL 'dir' is degrees clockwise from
    +y, hence sin for the x-component."""
    rad = F.radians(dir_deg)
    return speed * F.sin(rad), speed * F.cos(rad)
