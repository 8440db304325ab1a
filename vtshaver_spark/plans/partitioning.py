"""Engine-level partitioning facility (SURVEY §2.3 G7 + G6).

The reference's only parallelism knob is one-tile-per-libuv-task
(src/shave.cpp:470-471); at cluster scale the equivalent levers are
*which* rows share a partition and *how many* partitions a stage gets.
These helpers encode the engine's three standard layouts:

 - ``repartition_for_tiles``: range-partition by (z, x, y) so
   neighboring tiles co-locate — the layout for grouped tile encodes
   (``encode_tiles_mvt`` / ``encode_tiles``) and sorted tile-pyramid
   writes. Range (not hash) keeps spatial locality, which compresses
   better and turns tile-range queries into partition pruning.
 - ``repartition_by_cell``: hash-partition on a cell key (H3/S2/tile
   cell) for co-located cell joins — both sides partitioned on the
   same key join without a further shuffle.
 - ``salt``: explicit hot-key splitting for grouped-map kernels.
   applyInPandas groups are NOT AQE-splittable, so a hot cell (a city
   at z10) pins one task; a salt column bounds any group to
   ~|group|/n_salt rows, at the cost of a second-phase merge (see
   materialize.encode_tiles(salt_partials=...) for the merge shape).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def repartition_for_tiles(
    df: DataFrame,
    z: str = "z",
    x: str = "x",
    y: str = "y",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Range-partition by tile key; rows of one tile land in one
    partition and adjacent tiles cluster (Hilbert-ish locality via the
    y-within-x-within-z sort order)."""
    cols = [F.col(z), F.col(x), F.col(y)]
    if num_partitions:
        return df.repartitionByRange(num_partitions, *cols)
    return df.repartitionByRange(*cols)


def repartition_by_cell(
    df: DataFrame, cell_col: str, num_partitions: Optional[int] = None
) -> DataFrame:
    """Hash-partition on a cell id (H3/S2/packed tile cell) so
    cell-keyed joins/aggregations are co-located."""
    if num_partitions:
        return df.repartition(num_partitions, F.col(cell_col))
    return df.repartition(F.col(cell_col))


def salt(n_salt: int, *cols: str) -> Column:
    """Deterministic salt in [0, n_salt) from row content — split hot
    group keys for two-phase grouped-map kernels (G6). Pass row-unique
    columns (e.g. the feature/image id), NOT the group key."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))
