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
