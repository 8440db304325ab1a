"""Mapbox GL style -> per-source-layer filter IR.

Semantics mirror the reference's compile step
(/root/reference/lib/styleToFilters.js:21-204) exactly — including its
insertion-order property collection and its permissive "walk every
sub-array" property extraction, both pinned by the reference's golden
fixtures (test/styleToFilter.test.js:196-229). This is a from-scratch
Python implementation of those observable semantics, not a port of the
JS code structure.

Output IR shape (one record per `source-layer`):

    {layer_name: {"filters": True | ["any", f1, f2, ...],
                  "minzoom": float, "maxzoom": float,
                  "properties": True | [key, ...]}}

`filters is True` means keep-all; `properties is True` means keep every
feature property.
"""

from __future__ import annotations

import re
from typing import Any

# GL expression operator registry, per the public Mapbox style-spec
# (expression definitions as of style-spec v13.x — the version range the
# reference depends on). `is_expression` mirrors
# styleSpec.expression.isExpression: an array whose first element is a
# string naming a registered expression operator.
EXPRESSION_OPS = frozenset(
    {
        "let", "var", "literal", "array", "at", "in", "index-of", "slice",
        "case", "match", "coalesce", "step", "interpolate",
        "interpolate-hcl", "interpolate-lab", "collator", "format", "image",
        "number-format", "to-string", "to-number", "to-boolean", "to-color",
        "to-rgba", "string", "number", "boolean", "object", "typeof", "rgb",
        "rgba", "length", "has", "get", "properties", "feature-state",
        "geometry-type", "id", "zoom", "heatmap-density", "line-progress",
        "accumulated", "+", "*", "-", "/", "%", "^", "sqrt", "log10", "ln",
        "log2", "sin", "cos", "tan", "asin", "acos", "atan", "min", "max",
        "abs", "round", "floor", "ceil", "==", "!=", ">", "<", ">=", "<=",
        "all", "any", "!", "is-supported-script", "upcase", "downcase",
        "concat", "resolved-locale", "ln2", "pi", "e", "pitch",
        "distance-from-center", "distance", "within",
    }
)

_TEMPLATE_RE = re.compile(r"{[^}]+}")

# Sentinel distinct from user data for the no-op rewrite.
_NOOP = "noop"


def is_expression(value: Any) -> bool:
    """styleSpec.expression.isExpression equivalent."""
    return (
        isinstance(value, list)
        and len(value) > 0
        and isinstance(value[0], str)
        and value[0] in EXPRESSION_OPS
    )


def _js_truthy(value: Any) -> bool:
    """JS truthiness for the values that can appear in a style JSON.

    Note: an empty list is *truthy* in JS (unlike Python), which matters
    for degenerate empty filters.
    """
    if value is None or value is False:
        return False
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return value != 0
    if isinstance(value, str):
        return value != ""
    return True  # dict / list (including empty ones)


def replace_noop_expressions(exp: Any) -> Any:
    """Rewrite rendering-context-only subexpressions to literal-true.

    `pitch` / `distance-from-center` cannot be evaluated against tile
    data; inside `any`/`all` they become `["literal", true]`, otherwise
    the whole filter collapses to keep-all (reference behavior at
    lib/styleToFilters.js:151-173, CHANGELOG.md:4).

    Returns the sentinel string "noop" when the expression itself is a
    no-op (caller substitutes `["literal", true]`).
    """
    if not isinstance(exp, list):
        return exp
    if len(exp) > 0 and exp[0] in ("pitch", "distance-from-center"):
        return _NOOP
    new_exp = [
        replace_noop_expressions(sub) if isinstance(sub, list) else sub
        for sub in exp
    ]
    if _NOOP in new_exp:
        if len(new_exp) > 0 and new_exp[0] in ("any", "all"):
            return [
                ["literal", True] if sub == _NOOP else sub for sub in new_exp
            ]
        return _NOOP
    return new_exp


def _props_from_expression(exp: Any, properties: list) -> None:
    """Collect property keys referenced by a GL expression.

    `["get", k]` / `["has", k]` (2-ary only — the 3-ary object form reads
    a non-tile object), `["feature-state", k]`, and `["properties"]`
    (which forces keep-all, collected as the sentinel True).
    """
    if not isinstance(exp, list) or not exp:
        return
    op = exp[0]
    if op in ("get", "has"):
        has_object_arg = (
            len(exp) > 2 and _js_truthy(exp[2]) and isinstance(exp[2], (dict, list))
        )
        if len(exp) > 1 and isinstance(exp[1], str) and not has_object_arg:
            properties.append(exp[1])
    elif op == "feature-state":
        if len(exp) > 1:
            properties.append(exp[1])
    elif op == "properties":
        properties.append(True)
    for sub in exp:
        if isinstance(sub, list):
            _props_from_expression(sub, properties)


def _props_from_filter(filt: Any, properties: list) -> None:
    """Collect property keys from a filter (legacy or expression syntax).

    Mirrors the reference's permissive walk: when the filter contains
    sub-arrays they are each walked recursively; a leaf of the shape
    `[op, name, v...]` with a string second element contributes `name`
    unless it contains '$' ($type/$id are not tile properties). This
    intentionally reproduces the reference's behavior of collecting
    match-label strings (e.g. "street_limited") — the goldens pin it.
    """
    if is_expression(filt):
        _props_from_expression(filt, properties)
    if not isinstance(filt, list):
        return
    sub_filters = [f for f in filt if isinstance(f, list)]
    if sub_filters:
        for sub in sub_filters:
            _props_from_filter(sub, properties)
    else:
        if len(filt) >= 3 and isinstance(filt[1], str) and "$" not in filt[1]:
            properties.append(filt[1])


def _props_from_paint_layout(obj: Any, properties: list) -> None:
    """Collect property keys used by paint/layout values.

    String values contribute `{name}` template tokens; legacy function
    objects contribute their `property`; expression values are walked as
    expressions; any other container is walked recursively.
    """
    if isinstance(obj, dict):
        values = obj.values()
    elif isinstance(obj, list):
        values = obj
    else:
        return
    for value in values:
        if isinstance(value, str):
            for token in _TEMPLATE_RE.findall(value):
                properties.append(token[1:-1])
        elif isinstance(value, dict) and isinstance(value.get("property"), str):
            properties.append(value["property"])
        elif is_expression(value):
            _props_from_expression(value, properties)
        else:
            _props_from_paint_layout(value, properties)


def style_to_filters(style: Any) -> dict:
    """Fold a GL style's layers into one filter record per source-layer.

    Reference parity: filter union wraps per-layer filters in
    `["any", ...]`; any style layer without a filter makes the whole
    source-layer keep-all; zoom ranges widen (min of minzooms, max of
    maxzooms, defaults 0/22); properties accumulate in first-seen order
    and collapse to True when `["properties"]` was referenced.
    """
    layers: dict = {}
    if not isinstance(style, dict):
        return layers
    style_layers = style.get("layers")
    if not isinstance(style_layers, list):
        return layers

    for style_layer in style_layers:
        if not isinstance(style_layer, dict):
            continue
        layer_name = style_layer.get("source-layer")
        if not _js_truthy(layer_name):
            continue
        raw_filter = style_layer.get("filter")
        has_filter = _js_truthy(raw_filter)

        if layer_name in layers:
            rec = layers[layer_name]
            style_min = style_layer.get("minzoom") or 0
            style_max = style_layer.get("maxzoom") or 22
            if style_min < rec["minzoom"]:
                rec["minzoom"] = style_min
            if style_max > rec["maxzoom"]:
                rec["maxzoom"] = style_max
            if rec["filters"] is True or not has_filter:
                rec["filters"] = True
            else:
                rewritten = replace_noop_expressions(raw_filter)
                rec["filters"].append(
                    ["literal", True] if rewritten == _NOOP else rewritten
                )
        else:
            rec = layers[layer_name] = {}
            if has_filter:
                rewritten = replace_noop_expressions(raw_filter)
                rec["filters"] = [
                    "any",
                    ["literal", True] if rewritten == _NOOP else rewritten,
                ]
            else:
                rec["filters"] = True
            rec["minzoom"] = style_layer.get("minzoom") or 0
            rec["maxzoom"] = style_layer.get("maxzoom") or 22

        properties = rec.setdefault("properties", [])
        for section in ("paint", "layout"):
            section_obj = style_layer.get(section)
            if _js_truthy(section_obj):
                _props_from_paint_layout(section_obj, properties)
        if has_filter:
            _props_from_filter(raw_filter, properties)

    for rec in layers.values():
        props = rec["properties"]
        if any(p is True for p in props):
            rec["properties"] = True
        else:
            seen: dict = {}
            for p in props:
                if p not in seen:
                    seen[p] = True
            rec["properties"] = list(seen.keys())
    return layers
