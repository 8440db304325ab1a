"""Validated, compiled per-layer filter table (reference `Filters` parity).

Mirrors the reference's Filters constructor validation surface
(/root/reference/src/filters.cpp:34-166) with the same error messages,
then serves as the broadcastable driver-side plan input for the shave
operators: for each source-layer, a filter AST (or keep-all True), a
property allowlist (or keep-all True), and a [minzoom, maxzoom] range
stored as doubles (floating-point zooms are first-class —
src/filters.hpp:17 and the floating-point-zoom fixture).
"""

from __future__ import annotations

import numbers
from dataclasses import dataclass
from typing import Any, Optional, Union

from vtshaver_spark import errors as E
from vtshaver_spark.errors import FilterError, ShaveError
from vtshaver_spark.functions.expr import validate_filter


@dataclass(frozen=True)
class LayerFilter:
    """One compiled source-layer record."""

    layer: str
    filter: Union[bool, list]  # True => keep-all
    properties: Union[bool, tuple]  # True => keep-all, else key tuple
    minzoom: float
    maxzoom: float

    @property
    def keep_all_filter(self) -> bool:
        return self.filter is True

    @property
    def keep_all_properties(self) -> bool:
        return self.properties is True


def _is_number(v: Any) -> bool:
    return isinstance(v, numbers.Real) and not isinstance(v, bool)


class Filters:
    """Parse + validate a style filter IR (from ``style_to_filters``).

    Raises ``FilterError``/``ShaveError`` with the reference's exact
    messages on malformed input; on success holds an ordered mapping of
    layer name -> LayerFilter (sorted by layer name, matching the
    reference's std::map iteration order — src/filters.hpp:19).
    """

    def __init__(self, filters: Any):
        if not isinstance(filters, dict):
            raise ShaveError(E.MSG_FILTERS_NOT_OBJECT)
        table: dict[str, LayerFilter] = {}
        for layer_key, layer_val in filters.items():
            if layer_key is None:
                raise ShaveError(
                    "layer name must be a string and cannot be null or undefined"
                )
            if not isinstance(layer_val, dict):
                raise ShaveError(E.MSG_LAYER_NOT_OBJECT)

            if "minzoom" in layer_val:
                minzoom = layer_val["minzoom"]
                if not _is_number(minzoom) or minzoom < 0:
                    raise ShaveError(E.MSG_MINZOOM_POSITIVE)
                minzoom = float(minzoom)
            else:
                raise ShaveError(E.MSG_MINZOOM_REQUIRED)
            if "maxzoom" in layer_val:
                maxzoom = layer_val["maxzoom"]
                if not _is_number(maxzoom) or maxzoom < 0:
                    raise ShaveError(E.MSG_MAXZOOM_POSITIVE)
                maxzoom = float(maxzoom)
            else:
                raise ShaveError(E.MSG_MAXZOOM_REQUIRED)

            layer_filter = layer_val.get("filters")
            if layer_filter is None:
                raise ShaveError(E.MSG_FILTERS_MALFORMED)
            if isinstance(layer_filter, list):
                try:
                    validate_filter(layer_filter)
                except FilterError as err:
                    if str(err) == E.MSG_LEGACY_PROPERTY:
                        raise FilterError(E.MSG_MIXED_FILTER) from None
                    raise
                compiled_filter: Union[bool, list] = layer_filter
            elif layer_filter is True:
                compiled_filter = True
            else:
                raise FilterError(E.MSG_INVALID_FILTER_VALUE)

            layer_properties = layer_val.get("properties")
            if layer_properties is None:
                raise ShaveError(E.MSG_PROPERTIES_MALFORMED)
            if isinstance(layer_properties, list):
                properties: Union[bool, tuple] = tuple(
                    str(p) for p in layer_properties if str(p) != ""
                )
            elif layer_properties is True:
                properties = True
            else:
                raise FilterError(E.MSG_INVALID_FILTER_VALUE)

            table[str(layer_key)] = LayerFilter(
                layer=str(layer_key),
                filter=compiled_filter,
                properties=properties,
                minzoom=minzoom,
                maxzoom=maxzoom,
            )
        # std::map<string, ...> parity: iterate sorted by layer name
        self._table = dict(sorted(table.items()))

    def layers(self) -> list[str]:
        """Compiled layer names, sorted (src/filters.cpp:168-176)."""
        return list(self._table.keys())

    def get(self, layer: str) -> Optional[LayerFilter]:
        return self._table.get(layer)

    def __iter__(self):
        return iter(self._table.values())

    def __len__(self) -> int:
        return len(self._table)

    def __contains__(self, layer: str) -> bool:
        return layer in self._table
