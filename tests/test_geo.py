"""Geometry conversions (operators/geo.py): WKT/WKB/GeoJSON codecs +
the transform-registry surface."""

import json
import struct

import pytest

from sling_cli_spark.operators.geo import (
    geojson_obj_to_wkt, wkb_to_geojson_obj, wkt_to_geojson_obj)


@pytest.mark.parametrize("wkt,expected", [
    ("POINT (30 10)", {"type": "Point", "coordinates": [30.0, 10.0]}),
    ("POINT Z (1 2 3)", {"type": "Point", "coordinates": [1.0, 2.0, 3.0]}),
    ("LINESTRING (30 10, 10 30, 40 40)",
     {"type": "LineString",
      "coordinates": [[30.0, 10.0], [10.0, 30.0], [40.0, 40.0]]}),
    ("POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
     {"type": "Polygon",
      "coordinates": [[[30.0, 10.0], [40.0, 40.0], [20.0, 40.0],
                       [10.0, 20.0], [30.0, 10.0]]]}),
    ("MULTIPOINT ((10 40), (40 30))",
     {"type": "MultiPoint", "coordinates": [[10.0, 40.0], [40.0, 30.0]]}),
    ("MULTIPOINT (10 40, 40 30)",
     {"type": "MultiPoint", "coordinates": [[10.0, 40.0], [40.0, 30.0]]}),
    ("MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)))",
     {"type": "MultiPolygon",
      "coordinates": [[[[30.0, 20.0], [45.0, 40.0], [10.0, 40.0],
                        [30.0, 20.0]]]]}),
    ("POINT EMPTY", {"type": "Point", "coordinates": []}),
])
def test_wkt_to_geojson(wkt, expected):
    assert wkt_to_geojson_obj(wkt) == expected


def test_wkt_m_dropped():
    assert wkt_to_geojson_obj("POINT M (1 2 5)") == {
        "type": "Point", "coordinates": [1.0, 2.0]}
    assert wkt_to_geojson_obj("POINT ZM (1 2 3 5)") == {
        "type": "Point", "coordinates": [1.0, 2.0, 3.0]}


def test_geometry_collection_roundtrip():
    wkt = "GEOMETRYCOLLECTION (POINT (4 6), LINESTRING (4 6, 7 10))"
    obj = wkt_to_geojson_obj(wkt)
    assert obj["type"] == "GeometryCollection"
    assert obj["geometries"][0] == {"type": "Point",
                                    "coordinates": [4.0, 6.0]}
    assert geojson_obj_to_wkt(obj) == wkt


@pytest.mark.parametrize("wkt", [
    "POINT (30 10)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "MULTIPOINT ((10 40), (40 30))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)))",
])
def test_wkt_geojson_wkt_roundtrip(wkt):
    assert geojson_obj_to_wkt(wkt_to_geojson_obj(wkt)) == wkt


def _wkb_point(x, y, srid=None, z=None):
    code = 1
    parts = [struct.pack("<B", 1)]
    if z is not None:
        code |= 0x80000000
    if srid is not None:
        code |= 0x20000000
    parts.append(struct.pack("<I", code))
    if srid is not None:
        parts.append(struct.pack("<I", srid))
    parts.append(struct.pack("<dd", x, y))
    if z is not None:
        parts.append(struct.pack("<d", z))
    return b"".join(parts)


def test_wkb_point():
    assert wkb_to_geojson_obj(_wkb_point(30, 10)) == {
        "type": "Point", "coordinates": [30.0, 10.0]}


def test_ewkb_with_srid_and_z():
    got = wkb_to_geojson_obj(_wkb_point(1, 2, srid=4326, z=3))
    assert got == {"type": "Point", "coordinates": [1.0, 2.0, 3.0]}


def test_wkb_hex_string_with_prefix():
    h = "0x" + _wkb_point(5, 6).hex()
    assert wkb_to_geojson_obj(h) == {"type": "Point",
                                     "coordinates": [5.0, 6.0]}


def test_iso_wkb_z_typecode():
    # ISO WKB: Point Z = type 1001
    b = struct.pack("<BIddd", 1, 1001, 1, 2, 3)
    assert wkb_to_geojson_obj(b) == {
        "type": "Point", "coordinates": [1.0, 2.0, 3.0]}


def test_wkb_multipolygon():
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    poly = struct.pack("<BII", 1, 3, 1) + struct.pack(
        "<I", len(ring)) + b"".join(struct.pack("<dd", *p) for p in ring)
    mp = struct.pack("<BII", 1, 6, 1) + poly
    got = wkb_to_geojson_obj(mp)
    assert got["type"] == "MultiPolygon"
    assert got["coordinates"][0][0][1] == [4.0, 0.0]


def test_spark_transform_surface(spark):
    from sling_cli_spark.operators.transforms import apply_transforms

    df = spark.createDataFrame(
        [(1, "POINT (30 10)"),
         (2, "LINESTRING (0 0, 1 1)"),
         (3, None)],
        "id long, geom string")
    out = apply_transforms(df, {"geom": ["wkt_to_geojson"]})
    got = {r["id"]: r["geom"] for r in out.collect()}
    assert json.loads(got[1]) == {"type": "Point",
                                  "coordinates": [30.0, 10.0]}
    assert got[3] is None

    back = apply_transforms(out, {"geom": ["geojson_to_wkt"]})
    got2 = {r["id"]: r["geom"] for r in back.collect()}
    assert got2[1] == "POINT (30 10)" and got2[2] == "LINESTRING (0 0, 1 1)"


def test_spark_geometry_to_geojson_hex_ewkb(spark):
    from sling_cli_spark.operators.transforms import apply_transforms

    hex_pt = _wkb_point(7, 8, srid=4326).hex()
    df = spark.createDataFrame(
        [(1, hex_pt), (2, "POINT (1 2)")], "id long, g string")
    out = apply_transforms(df, {"g": ["geometry_to_geojson"]})
    got = {r["id"]: json.loads(r["g"]) for r in out.collect()}
    assert got[1] == {"type": "Point", "coordinates": [7.0, 8.0]}
    assert got[2] == {"type": "Point", "coordinates": [1.0, 2.0]}
