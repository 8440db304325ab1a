"""H3 cell API with a built-in fallback.

When the real ``h3`` package is importable, cells are genuine H3 ids
computed via a vectorized pandas UDF (batched ``latlng_to_cell`` —
G1: no per-row Python in the Spark plan, the batch loop is inside
Arrow). When it is not (this container), the same API is served by the
engine's S2 index at an equivalent resolution so pipelines keep
working; ids are then S2 ids, flagged by ``is_native_h3()``.

Resolution mapping (average-cell-area equivalence, from the published
H3/S2 level tables): H3 res r ~ S2 level 2r+1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from vtshaver_spark.functions.s2 import s2_cell_id_np

try:
    import h3 as _h3

    HAS_H3 = True
except ImportError:
    _h3 = None
    HAS_H3 = False


def is_native_h3() -> bool:
    return HAS_H3


def _s2_level_for_res(res: int) -> int:
    return min(30, 2 * res + 1)


def h3_cell_udf(res: int = 9):
    if HAS_H3:

        @pandas_udf(T.LongType())
        def _cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
            la = lat.to_numpy(dtype=np.float64)
            lo = lon.to_numpy(dtype=np.float64)
            # best-available vectorization first (G1: no per-row Python
            # when the library offers a batch path):
            #  1. h3-py 3.x unstable.vect.geo_to_h3 — true C-loop batch
            #  2. h3-py 4.x api.numpy_int — int output, no hex parsing
            #  3. scalar string API as the last resort
            try:
                from h3.unstable import vect  # type: ignore

                return pd.Series(vect.geo_to_h3(la, lo, res).astype(np.int64))
            except Exception:
                pass
            int_api = getattr(getattr(_h3, "api", None), "numpy_int", None)
            if int_api is not None:
                f = int_api.latlng_to_cell
                return pd.Series(
                    np.fromiter(
                        (f(a, o, res) for a, o in zip(la, lo)),
                        dtype=np.int64,
                        count=len(la),
                    )
                )
            return pd.Series(
                np.fromiter(
                    (int(_h3.latlng_to_cell(a, o, res), 16) for a, o in zip(la, lo)),
                    dtype=np.int64,
                    count=len(la),
                )
            )

        return _cell

    level = _s2_level_for_res(res)

    @pandas_udf(T.LongType())
    def _cell_fallback(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            s2_cell_id_np(
                lon.to_numpy(dtype=np.float64),
                lat.to_numpy(dtype=np.float64),
                level,
            )
        )

    return _cell_fallback


def with_h3_cell(
    df: DataFrame, lon: str = "lon", lat: str = "lat", res: int = 9, out: str = "cell_h3"
) -> DataFrame:
    return df.withColumn(out, h3_cell_udf(res)(F.col(lat), F.col(lon)))


def grid_disk(cell: int, k: int = 1) -> list:
    """Neighbor ring (real H3 only — the fallback index does kNN
    candidate generation with tile-cell rings instead, see
    operators/knn.knn_join_cells)."""
    if not HAS_H3:
        raise NotImplementedError(
            "grid_disk needs the real h3 package; use "
            "functions.geo.grid_disk_tile (packed tile cells, same ring "
            "contract) or knn_join_cells's tile-cell rings in this "
            "environment"
        )
    return [int(c, 16) for c in _h3.grid_disk(_h3.int_to_str(cell), k)]
