"""Style-compile golden + semantics tests.

Golden parity runs against the reference's fixture JSONs when the
reference checkout is available (semantics verification only — the
fixtures are Mapbox's public test styles); the hand-written cases below
are self-contained re-statements of the reference's unit expectations
(/root/reference/test/styleToFilter.test.js:13-194).
"""

import json
import os

import pytest

from vtshaver_spark.style.compile import style_to_filters

REF_FIXTURES = "/root/reference/test/fixtures"
HAS_REF = os.path.isdir(REF_FIXTURES)


@pytest.mark.skipif(not HAS_REF, reason="reference fixtures not available")
@pytest.mark.parametrize(
    "style_file,golden_file",
    [
        ("bright-v9.json", "bright-filter.json"),
        ("floating-point-zoom.json", "floating-filter.json"),
        ("expressions-legacy.json", "expressions-filter.json"),
    ],
)
def test_golden_parity(style_file, golden_file):
    with open(f"{REF_FIXTURES}/styles/{style_file}") as f:
        style = json.load(f)
    with open(f"{REF_FIXTURES}/filters/{golden_file}") as f:
        golden = json.load(f)
    assert style_to_filters(style) == golden


def test_degenerate_inputs():
    assert style_to_filters({}) == {}
    assert style_to_filters([]) == {}
    assert style_to_filters("hello") == {}
    assert style_to_filters({"layers": []}) == {}
    assert style_to_filters({"layers": "lol no layers here"}) == {}
    assert style_to_filters({"layers": [{"arbitrary": "layer"}]}) == {}


def test_zoom_defaults_and_explicit():
    assert style_to_filters({"layers": [{"source-layer": "water"}]}) == {
        "water": {"filters": True, "minzoom": 0, "maxzoom": 22, "properties": []}
    }
    assert style_to_filters(
        {"layers": [{"source-layer": "water", "minzoom": 10, "maxzoom": 15}]}
    ) == {"water": {"filters": True, "minzoom": 10, "maxzoom": 15, "properties": []}}


def test_filter_wrap_and_union():
    out = style_to_filters(
        {"layers": [{"source-layer": "water", "filter": ["==", "color", "blue"]}]}
    )
    assert out == {
        "water": {
            "filters": ["any", ["==", "color", "blue"]],
            "minzoom": 0,
            "maxzoom": 22,
            "properties": ["color"],
        }
    }
    # a style layer without a filter forces keep-all for the source-layer
    out = style_to_filters(
        {
            "layers": [
                {"source-layer": "water"},
                {"source-layer": "water", "filter": ["==", "color", "blue"]},
            ]
        }
    )
    assert out["water"]["filters"] is True
    assert out["water"]["properties"] == ["color"]
    # two filtered layers OR together
    out = style_to_filters(
        {
            "layers": [
                {"source-layer": "water", "filter": ["==", "color", "blue"]},
                {"source-layer": "water", "filter": ["==", "color", "red"]},
            ]
        }
    )
    assert out["water"]["filters"] == [
        "any",
        ["==", "color", "blue"],
        ["==", "color", "red"],
    ]


def test_zoom_union_widens():
    out = style_to_filters(
        {
            "layers": [
                {"source-layer": "water", "minzoom": 10, "maxzoom": 15},
                {"source-layer": "water", "minzoom": 8, "maxzoom": 12},
            ]
        }
    )
    assert out["water"]["minzoom"] == 8
    assert out["water"]["maxzoom"] == 15


def test_noop_expression_rewrite():
    # pitch / distance-from-center collapse to literal-true
    out = style_to_filters(
        {
            "layers": [
                {"source-layer": "landcover", "filter": ["<", ["pitch"], 30]},
            ]
        }
    )
    assert out["landcover"]["filters"] == ["any", ["literal", True]]
    # inside any/all the noop subexpression becomes literal-true in place
    out = style_to_filters(
        {
            "layers": [
                {
                    "source-layer": "water",
                    "filter": [
                        "all",
                        ["<", ["pitch"], 30],
                        ["==", "color", "blue"],
                    ],
                }
            ]
        }
    )
    assert out["water"]["filters"] == [
        "any",
        ["all", ["literal", True], ["==", "color", "blue"]],
    ]


def test_property_collection_paint_layout():
    out = style_to_filters(
        {
            "layers": [
                {
                    "source-layer": "housenum_label",
                    "layout": {
                        "text-field": {"stops": [[11, "{ref}"], [12, "{name_zh}"]]}
                    },
                    "paint": {"icon": "{maki}-{size}", "legacy": {"property": "p5"}},
                }
            ]
        }
    )
    assert out["housenum_label"]["properties"] == ["maki", "size", "p5", "ref", "name_zh"]


def test_properties_expression_forces_all():
    out = style_to_filters(
        {
            "layers": [
                {
                    "source-layer": "water",
                    "paint": {"x": ["properties"], "y": ["get", "depth"]},
                }
            ]
        }
    )
    assert out["water"]["properties"] is True


def test_dollar_keys_excluded():
    out = style_to_filters(
        {
            "layers": [
                {
                    "source-layer": "road",
                    "filter": ["all", ["==", "$type", "LineString"], ["==", "class", "street"]],
                }
            ]
        }
    )
    assert out["road"]["properties"] == ["class"]
