"""GeoJSON loader tests."""

import json

import numpy as np

from rasterflow.geom.pip import points_in_polygon
from rasterflow.geom.polyio import read_geojson


GJ = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]],
            },
        },
        {
            "type": "Feature",
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[10, 10], [12, 10], [12, 12], [10, 12]]],
                    [[[20, 20], [22, 20], [22, 22], [20, 22]]],
                ],
            },
        },
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1, 1]}},
    ],
}


def test_read_geojson_dict():
    layer = read_geojson(GJ, name="gj")
    assert layer.npolys == 2  # point geometry skipped
    # polygon 0: closing vertex deduped
    assert layer.ring_offsets[1] - layer.ring_offsets[0] == 4
    # multipolygon: both parts covered by even-odd over poly id 1
    px = np.array([11.0, 21.0, 15.0])
    py = np.array([11.0, 21.0, 15.0])
    inside = points_in_polygon(px, py, layer.verts, layer.rings_of(1))
    assert list(inside) == [True, True, False]


def test_read_geojson_file_and_project(tmp_path):
    gj = {
        "type": "Feature",
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[-100.0, 30.0], [-99.0, 30.0], [-99.0, 31.0], [-100.0, 31.0]]],
        },
    }
    p = tmp_path / "a.geojson"
    p.write_text(json.dumps(gj))
    layer = read_geojson(p, project=True)
    assert layer.npolys == 1
    # outside-bbox polygon dropped under projection
    gj["geometry"]["coordinates"] = [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]
    p.write_text(json.dumps(gj))
    assert read_geojson(p, project=True).npolys == 0
