"""CLI smoke tests (reference test/cli.test.js:16-67 parity: exit
codes, --sources subsetting incl. missing-source error) plus the
compress option-validation contract (src/shave.cpp:412-446)."""

import json

import pytest

from vtshaver_spark import errors as E
from vtshaver_spark.cli import main
from vtshaver_spark.errors import ShaveError, validate_compress

SF_TILE = "/root/reference/test/fixtures/tiles/sf_16_10465_25329.vector.pbf"


@pytest.fixture()
def style_file(tmp_path):
    p = tmp_path / "style.json"
    p.write_text(
        json.dumps(
            {
                "layers": [
                    {"source-layer": "poi_label", "filter": ["==", "maki", "cafe"]},
                    {"source-layer": "water"},
                ]
            }
        )
    )
    return str(p)


def test_filters_cli(style_file, capsys):
    rc = main(["filters", "--style", style_file, "--pretty"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"poi_label", "water"}


def test_filters_cli_sources_subset(style_file, capsys):
    rc = main(["filters", "--style", style_file, "--sources", "water"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"water"}


def test_filters_cli_missing_source(style_file, capsys):
    rc = main(["filters", "--style", style_file, "--sources", "nope"])
    assert rc == 1
    assert "nope" in capsys.readouterr().err


def test_compress_validation_messages():
    assert validate_compress(None) is False
    assert validate_compress(True) is True
    assert validate_compress({"type": "gzip"}) is True
    assert validate_compress({"type": "none"}) is False
    assert validate_compress({"type": "gzip", "level": 6}) is True
    with pytest.raises(ShaveError, match="not provided"):
        validate_compress({})
    with pytest.raises(ShaveError) as ex:
        validate_compress({"type": 5})
    assert str(ex.value) == E.MSG_COMPRESS_TYPE
    with pytest.raises(ShaveError) as ex:
        validate_compress({"type": "zstd"})
    assert str(ex.value) == E.MSG_COMPRESS_UNKNOWN
    with pytest.raises(ShaveError) as ex:
        validate_compress({"type": "gzip", "level": -1})
    assert str(ex.value) == E.MSG_COMPRESS_LEVEL


def test_shave_tile_cli(style_file, tmp_path, capsys):
    out_file = str(tmp_path / "shaved.mvt")
    rc = main(
        [
            "shave-tile",
            "--tile", SF_TILE,
            "--style", style_file,
            "--zoom", "16",
            "--out", out_file,
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # cafe style keeps poi_label(1 cafe feature) + water keep-all(3)
    assert report["features_after"] == 4
    assert 0 < report["bytes_after"] < report["bytes_before"]

    from vtshaver_spark.sources.mvt import tile_to_rows

    with open(out_file, "rb") as f:
        rows = tile_to_rows(f.read())
    by_layer = {}
    for r in rows:
        by_layer[r["layer"]] = by_layer.get(r["layer"], 0) + 1
    assert by_layer == {"poi_label": 1, "water": 3}


def test_shave_cli_with_vertices(spark, tmp_path, capsys):
    """--vertices routes a within style filter through full-geometry
    evaluation in the batch shave CLI: the hole-crossing LineString is
    dropped even though all its vertices are in the fill."""
    donut = {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
            [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]],
        ],
    }
    style_p = tmp_path / "wstyle.json"
    style_p.write_text(json.dumps(
        {"layers": [{"source-layer": "road", "filter": ["within", donut]}]}
    ))
    feats = spark.createDataFrame(
        [
            (16, 0, 0, "road", 1, "LineString", {"class": "street"}),
            (16, 0, 0, "road", 3, "LineString", {"class": "street"}),
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, props map<string,string>",
    )
    verts = spark.createDataFrame(
        [
            (16, 0, 0, "road", 1, "LineString", 0, 0, 3.0, 5.0),
            (16, 0, 0, "road", 1, "LineString", 0, 1, 7.0, 5.0),  # crosses hole
            (16, 0, 0, "road", 3, "LineString", 0, 0, 1.0, 1.0),
            (16, 0, 0, "road", 3, "LineString", 0, 1, 2.0, 1.5),
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, path_idx int, vertex_idx int, lon double, lat double",
    )
    fin = str(tmp_path / "feats.parquet")
    vin = str(tmp_path / "verts.parquet")
    feats.write.parquet(fin)
    verts.write.parquet(vin)
    out = str(tmp_path / "out")
    rc = main([
        "shave", "--style", str(style_p), "--input", fin, "--output", out,
        "--zoom", "16", "--maxzoom", "16", "--vertices", vin,
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["features_before"] == 2 and report["features_after"] == 1
    kept = {r["feature_id"] for r in spark.read.parquet(out + "/shaved").collect()}
    assert kept == {3}
