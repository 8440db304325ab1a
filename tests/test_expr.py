"""GL expression compiler unit tests: truth tables per operator.

Each case evaluates a compiled Column against a tiny in-memory feature
set, checking GL coercion/null semantics (absent key behavior, typed
comparisons, truthiness) — SURVEY §2.2's operator inventory.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vtshaver_spark.errors import FilterError
from vtshaver_spark.functions.expr import (
    FilterContext,
    filter_to_column,
    is_expression_filter,
)

SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType(), True),
        T.StructField("geom_type", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

ROWS = [
    (1, "Point", {"maki": "cafe", "rank": "3", "flag": "true", "name": "Alpha"}),
    (2, "Point", {"maki": "toilet", "rank": "7", "flag": "false"}),
    (3, "LineString", {"rank": "abc"}),
    (None, "Polygon", {}),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def ids(df, filt, zoom=14.0):
    ctx = FilterContext(zoom=zoom)
    col = filter_to_column(filt, ctx)
    return {
        r["feature_id"]
        for r in df.filter(col).select("feature_id").collect()
    }


# --- legacy ---------------------------------------------------------------

def test_legacy_eq_absent_false(df):
    assert ids(df, ["==", "maki", "cafe"]) == {1}
    assert ids(df, ["==", "missing", "x"]) == set()


def test_legacy_ne_absent_true(df):
    # absent key => true (GL legacy truth table)
    assert ids(df, ["!=", "maki", "cafe"]) == {2, 3, None}


def test_legacy_numeric_compare(df):
    assert ids(df, ["<", "rank", 5]) == {1}
    assert ids(df, [">=", "rank", 3]) == {1, 2}
    # non-numeric value => type mismatch => false (row 3 rank='abc')
    assert ids(df, ["<", "rank", 999]) == {1, 2}


def test_legacy_in_notin(df):
    assert ids(df, ["in", "maki", "cafe", "toilet"]) == {1, 2}
    assert ids(df, ["!in", "maki", "cafe", "toilet"]) == {3, None}
    assert ids(df, ["!in", "missing", "x"]) == {1, 2, 3, None}


def test_legacy_has(df):
    assert ids(df, ["has", "maki"]) == {1, 2}
    assert ids(df, ["!has", "maki"]) == {3, None}
    assert ids(df, ["has", "$id"]) == {1, 2, 3}


def test_legacy_bool_compare(df):
    assert ids(df, ["==", "flag", True]) == {1}
    assert ids(df, ["==", "flag", False]) == {2}


def test_legacy_type_and_id(df):
    assert ids(df, ["==", "$type", "Point"]) == {1, 2}
    assert ids(df, ["!=", "$type", "Point"]) == {3, None}
    assert ids(df, ["==", "$id", 2]) == {2}


def test_legacy_combinators(df):
    assert ids(df, ["all", ["has", "maki"], ["<", "rank", 5]]) == {1}
    assert ids(df, ["any", ["==", "maki", "cafe"], ["==", "$type", "LineString"]]) == {1, 3}
    assert ids(df, ["none", ["has", "maki"]]) == {3, None}


# --- expressions ----------------------------------------------------------

def test_expr_eq_get(df):
    assert ids(df, ["==", ["get", "maki"], "cafe"]) == {1}
    # expression '!=' with null operand -> false (unlike legacy)
    assert ids(df, ["!=", ["get", "maki"], "cafe"]) == {2}


def test_expr_number_assertion(df):
    assert ids(df, ["<=", ["number", ["get", "rank"]], 3]) == {1}


def test_expr_match(df):
    f = ["match", ["get", "maki"], ["cafe", "toilet"], True, False]
    assert ids(df, f) == {1, 2}
    f = ["match", ["get", "maki"], "cafe", True, False]
    assert ids(df, f) == {1}


def test_expr_case_coalesce(df):
    f = ["case", ["has", "maki"], ["==", ["get", "maki"], "cafe"], False]
    assert ids(df, f) == {1}
    f = ["==", ["coalesce", ["get", "missing"], ["get", "maki"]], "cafe"]
    assert ids(df, f) == {1}


def test_expr_step_zoom(df):
    f = ["step", ["zoom"], ["has", "maki"], 15, ["has", "rank"]]
    assert ids(df, f, zoom=14.0) == {1, 2}
    assert ids(df, f, zoom=15.0) == {1, 2, 3}


def test_expr_to_boolean(df):
    # GL truthiness on strings: false iff null/empty
    assert ids(df, ["to-boolean", ["get", "maki"]]) == {1, 2}


def test_expr_geometry_and_id(df):
    assert ids(df, ["==", ["geometry-type"], "Polygon"]) == {None}
    assert ids(df, ["==", ["id"], 3]) == {3}


def test_expr_string_ops(df):
    assert ids(df, ["==", ["downcase", ["get", "name"]], "alpha"]) == {1}
    assert ids(df, ["==", ["upcase", ["get", "maki"]], "CAFE"]) == {1}
    assert ids(df, ["==", ["concat", ["get", "maki"], "!"], "cafe!"]) == {1}
    # NB: a top-level ["in", ...] filter is always LEGACY by the mbgl
    # dispatch rule; the expression form only occurs nested inside
    # expression context.
    assert ids(df, ["==", ["in", "afe", ["get", "maki"]], True]) == {1}
    assert ids(df, ["==", ["in", ["get", "maki"], ["literal", ["cafe", "bar"]]], True]) == {1}


def test_expr_arithmetic(df):
    assert ids(df, ["==", ["+", ["number", ["get", "rank"]], 1], 4]) == {1}
    assert ids(df, [">", ["*", ["number", ["get", "rank"]], 2], 10]) == {2}
    assert ids(df, ["==", ["length", ["get", "maki"]], 4]) == {1}


def test_expr_let_var(df):
    f = ["let", "r", ["number", ["get", "rank"]], ["<", ["var", "r"], 5]]
    assert ids(df, f) == {1}


def test_expr_number_format(df):
    assert ids(df, ["==", ["number-format", ["get", "rank"], {}], "3"]) == {1}


def test_expr_feature_state_null(df):
    # feature-state has no tile data: evaluates null -> filter false
    assert ids(df, ["==", ["feature-state", "hover"], "x"]) == set()


# --- dispatch parity ------------------------------------------------------

def test_is_expression_filter():
    assert is_expression_filter(["==", ["get", "a"], 1])
    assert not is_expression_filter(["==", "a", 1])
    assert not is_expression_filter(["in", "class", "a", "b"])
    assert not is_expression_filter(["!has", "a"])
    assert is_expression_filter(["match", ["get", "a"], "x", True, False])
    # any/all: expression iff ALL children are expressions
    assert is_expression_filter(["any", ["match", ["get", "a"], "x", True, False]])
    assert not is_expression_filter(
        ["any", ["match", ["get", "a"], "x", True, False], ["==", "a", "b"]]
    )


def test_unsupported_operator_raises():
    with pytest.raises(FilterError):
        filter_to_column(["frobnicate", "x"], FilterContext())
