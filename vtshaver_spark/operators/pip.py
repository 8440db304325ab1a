"""Point-in-polygon joins (SURVEY §2.3 G3).

 - ``pip_rect_join``: rectangles (the common style-extent case) as a
   broadcast range join — pure Catalyst, no UDF.
 - ``pip_polygon_join``: arbitrary rings via a vectorized numpy
   ray-casting kernel inside ``mapInPandas``. The polygon set is
   broadcast to every partition as plain Python data (the style-
   relevant polygon side is dimension-sized); candidates are first
   pruned by bounding box WITHIN the kernel, so the Python cost is
   O(points x candidate polygons) on numpy arrays, not per-row
   Python objects.

Scale note: both paths keep the big (point) side un-shuffled — the
polygon side replicates, matching the reference's broadcast-filters
execution shape (one immutable Filters shared by all workers,
/root/reference/src/shave.cpp:470-471).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pip_rect_join(
    points: DataFrame,
    rects: DataFrame,
    point_id: str = "image_id",
    poly_id: str = "polygon_id",
) -> DataFrame:
    """Broadcast inequality join: point in [lon_min,lon_max]x[lat_min,lat_max].

    Half-open on the max edges so adjacent rectangles never double-count.
    """
    r = F.broadcast(
        rects.select(poly_id, "lon_min", "lat_min", "lon_max", "lat_max")
    )
    cond = (
        (points["lon"] >= r["lon_min"])
        & (points["lon"] < r["lon_max"])
        & (points["lat"] >= r["lat_min"])
        & (points["lat"] < r["lat_max"])
    )
    return points.join(r, cond).drop("lon_min", "lat_min", "lon_max", "lat_max")


def _ray_cast(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd rule: for each point, count edge crossings of
    a horizontal ray. ring: (m,2) closed coordinate array."""
    inside = np.zeros(px.shape[0], dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for j in range(x0.shape[0]):
        ax, ay, bx, by = x0[j], y0[j], x1[j], y1[j]
        crosses = ((ay > py) != (by > py)) & (
            px < (bx - ax) * (py - ay) / (by - ay + 1e-300) + ax
        )
        inside ^= crosses
    return inside


def pip_polygon_join(
    points: DataFrame,
    polygons: list,
    point_id: str = "image_id",
) -> DataFrame:
    """Generic PIP: ``polygons`` is a driver-side list of
    ``(polygon_id, ring)`` where ring is a closed [[lon,lat],...] list.

    Output: the point rows with an added ``polygon_id`` (one row per
    containing polygon). Executed as mapInPandas: bbox prune first,
    then the numpy ray-cast on survivors only.
    """
    polys = [
        (int(pid), np.asarray(ring, dtype=np.float64)) for pid, ring in polygons
    ]
    bboxes = [
        (pid, ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max())
        for pid, ring in polys
    ]
    out_schema = T.StructType(
        points.schema.fields + [T.StructField("polygon_id", T.LongType(), False)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            px = pdf["lon"].to_numpy(dtype=np.float64)
            py = pdf["lat"].to_numpy(dtype=np.float64)
            outs = []
            for (pid, ring), (_, x0, y0, x1, y1) in zip(polys, bboxes):
                cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                if not cand.any():
                    continue
                idx = np.flatnonzero(cand)
                hit = idx[_ray_cast(px[idx], py[idx], ring)]
                if hit.size:
                    sub = pdf.iloc[hit].copy()
                    sub["polygon_id"] = pid
                    outs.append(sub)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return points.mapInPandas(kernel, schema=out_schema)


def rect_rings(rects: list) -> list:
    """Convenience: (pid, lon_min, lat_min, lon_max, lat_max) ->
    (pid, closed ring) for cross-checking the two PIP paths."""
    out = []
    for pid, x0, y0, x1, y1 in rects:
        out.append(
            (pid, [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        )
    return out
