"""Geometry conversions: WKT / (E)WKB -> GeoJSON and back.

Reference surface: ``core/dbio/iop/datastream.go:2526-2574``
(convertGeometryToGeoJSON — PostGIS hex-EWKB to GeoJSON via
twpayne/go-geom) and the geojson writers (``sinks/formats.py`` here).
The formats themselves are open specs: WKT/WKB from OGC Simple
Features, EWKB's SRID/Z flags from PostGIS docs, GeoJSON RFC 7946.

Geometry parsing is genuinely inexpressible in Catalyst built-ins, so
this is one of the sanctioned Pandas-UDF cases: pure-Python codecs
applied per Arrow batch (vectorized transfer, no per-row Python round
trip through the JVM). Supports Point, LineString, Polygon, the Multi*
variants, and GeometryCollection; Z coordinates pass through, M is
dropped (GeoJSON has no M).
"""

from __future__ import annotations

import json
import re
import struct
from typing import Any

# ------------------------------------------------------------------- WKT

_WKT_HEAD = re.compile(
    r"^\s*([A-Za-z]+)\s*(ZM|Z|M)?\s*(EMPTY|\(.*\))\s*$", re.S)


def _parse_group(s: str, i: int):
    """'(' ... ')' -> nested lists; leaves are coordinate lists."""
    assert s[i] == "("
    i += 1
    out: list[Any] = []
    while True:
        while i < len(s) and s[i].isspace():
            i += 1
        if s[i] == "(":
            sub, i = _parse_group(s, i)
            out.append(sub)
        else:
            j = i
            depth = 0
            while j < len(s) and (depth > 0 or s[j] not in ",)"):
                j += 1
            nums = [float(x) for x in s[i:j].split()]
            out.append(nums)
            i = j
        while i < len(s) and s[i].isspace():
            i += 1
        if s[i] == ",":
            i += 1
            continue
        if s[i] == ")":
            return out, i + 1


def _strip_m(pos: list[float], mode: str | None) -> list[float]:
    if mode == "M" and len(pos) >= 3:
        return pos[:2]
    if mode == "ZM" and len(pos) >= 4:
        return pos[:3]
    return pos


def _flatten_points(group: list) -> list:
    # MULTIPOINT ((1 2),(3 4)) parses nested; (1 2, 3 4) parses flat
    return [g[0] if isinstance(g[0], list) else g for g in group]


def _split_top(s: str) -> list[str]:
    """Split 'A(...), B(...)' on top-level commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def wkt_to_geojson_obj(wkt: str) -> dict | None:
    m = _WKT_HEAD.match(wkt or "")
    if not m:
        return None
    typ, zm, body = m.group(1).upper(), m.group(2), m.group(3)
    names = {"POINT": "Point", "LINESTRING": "LineString",
             "POLYGON": "Polygon", "MULTIPOINT": "MultiPoint",
             "MULTILINESTRING": "MultiLineString",
             "MULTIPOLYGON": "MultiPolygon",
             "GEOMETRYCOLLECTION": "GeometryCollection"}
    if typ not in names:
        return None
    if body == "EMPTY":
        if typ == "GEOMETRYCOLLECTION":
            return {"type": names[typ], "geometries": []}
        return {"type": names[typ], "coordinates": []}
    if typ == "GEOMETRYCOLLECTION":
        inner = body[1:-1]
        return {"type": "GeometryCollection",
                "geometries": [wkt_to_geojson_obj(g)
                               for g in _split_top(inner)]}
    group, _ = _parse_group(body, body.index("("))

    def clean(p):
        return _strip_m(p, zm)

    if typ == "POINT":
        coords: Any = clean(group[0])
    elif typ in ("LINESTRING",):
        coords = [clean(p) for p in group]
    elif typ == "MULTIPOINT":
        coords = [clean(p) for p in _flatten_points(group)]
    elif typ in ("POLYGON", "MULTILINESTRING"):
        coords = [[clean(p) for p in ring] for ring in group]
    else:  # MULTIPOLYGON
        coords = [[[clean(p) for p in ring] for ring in poly]
                  for poly in group]
    return {"type": names[typ], "coordinates": coords}


def _pos_wkt(pos: list[float]) -> str:
    return " ".join(format(v, "g") for v in pos)


def geojson_obj_to_wkt(obj: dict) -> str | None:
    if not isinstance(obj, dict):
        return None
    typ = obj.get("type")
    if typ == "GeometryCollection":
        inner = ", ".join(
            geojson_obj_to_wkt(g) or "" for g in obj.get("geometries", []))
        return f"GEOMETRYCOLLECTION ({inner})" if inner \
            else "GEOMETRYCOLLECTION EMPTY"
    c = obj.get("coordinates")
    if c is None:
        return None
    if not c:
        return f"{typ.upper()} EMPTY"
    if typ == "Point":
        return f"POINT ({_pos_wkt(c)})"
    if typ == "LineString":
        return f"LINESTRING ({', '.join(_pos_wkt(p) for p in c)})"
    if typ == "MultiPoint":
        return f"MULTIPOINT ({', '.join(f'({_pos_wkt(p)})' for p in c)})"
    if typ in ("Polygon", "MultiLineString"):
        rings = ", ".join(
            f"({', '.join(_pos_wkt(p) for p in ring)})" for ring in c)
        return f"{typ.upper()} ({rings})"
    if typ == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join(
                f"({', '.join(_pos_wkt(p) for p in ring)})" for ring in poly)
            + ")" for poly in c)
        return f"MULTIPOLYGON ({polys})"
    return None


# ------------------------------------------------------------------- WKB

_WKB_TYPES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
              5: "MultiLineString", 6: "MultiPolygon",
              7: "GeometryCollection"}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _parse_wkb_geom(b: bytes, i: int):
    bo = "<" if b[i] == 1 else ">"
    i += 1
    (code,) = struct.unpack_from(bo + "I", b, i)
    i += 4
    dim = 2
    has_m = False
    if code & _EWKB_SRID:  # PostGIS EWKB: skip SRID
        i += 4
    if code & _EWKB_Z:
        dim += 1
    if code & _EWKB_M:
        has_m = True
    base = code & 0xFFFF
    if base >= 3000:       # ISO ZM
        base -= 3000
        dim, has_m = 3, True
    elif base >= 2000:     # ISO M
        base -= 2000
        has_m = True
    elif base >= 1000:     # ISO Z
        base -= 1000
        dim = 3

    typ = _WKB_TYPES.get(base)
    if typ is None:
        raise ValueError(f"wkb: unsupported geometry type {code}")
    n_read = dim + (1 if has_m else 0)

    def read_pos(i):
        vals = struct.unpack_from(bo + "d" * n_read, b, i)
        return list(vals[:dim]), i + 8 * n_read

    def read_ring(i):
        (n,) = struct.unpack_from(bo + "I", b, i)
        i += 4
        pts = []
        for _ in range(n):
            p, i = read_pos(i)
            pts.append(p)
        return pts, i

    if typ == "Point":
        c, i = read_pos(i)
        return {"type": typ, "coordinates": c}, i
    if typ == "LineString":
        c, i = read_ring(i)
        return {"type": typ, "coordinates": c}, i
    if typ == "Polygon":
        (n,) = struct.unpack_from(bo + "I", b, i)
        i += 4
        rings = []
        for _ in range(n):
            r, i = read_ring(i)
            rings.append(r)
        return {"type": typ, "coordinates": rings}, i
    # Multi* / collection: n nested full geometries
    (n,) = struct.unpack_from(bo + "I", b, i)
    i += 4
    subs = []
    for _ in range(n):
        g, i = _parse_wkb_geom(b, i)
        subs.append(g)
    if typ == "GeometryCollection":
        return {"type": typ, "geometries": subs}, i
    return {"type": typ,
            "coordinates": [g["coordinates"] for g in subs]}, i


def wkb_to_geojson_obj(val) -> dict | None:
    """bytes, or PostGIS hex string (optionally \\x / 0x prefixed)."""
    if val is None:
        return None
    if isinstance(val, str):
        h = val.strip()
        for pre in ("\\x", "0x"):
            if h.startswith(pre):
                h = h[len(pre):]
        try:
            val = bytes.fromhex(h)
        except ValueError:
            return None
    if not val:
        return None
    try:
        geom, _ = _parse_wkb_geom(bytes(val), 0)
        return geom
    except Exception:
        return None


# ---------------------------------------------------------- spark surface

def _make_udfs():
    # note: pandas_udf type-hint inference is defeated by this module's
    # `from __future__ import annotations`; register with explicit
    # returnType + plain callables instead
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _wkt_to_geojson(s):
        def conv(v):
            if v is None:
                return None
            obj = wkt_to_geojson_obj(v)
            return json.dumps(obj) if obj else None
        return s.map(conv)

    def _geojson_to_wkt(s):
        def conv(v):
            if v is None:
                return None
            try:
                return geojson_obj_to_wkt(json.loads(v))
            except Exception:
                return None
        return s.map(conv)

    def _geometry_to_geojson(s):
        # the reference's convertGeometryToGeoJSON: hex-EWKB/WKB bytes
        # or WKT strings -> GeoJSON text
        def conv(v):
            if v is None:
                return None
            obj = None
            if isinstance(v, (bytes, bytearray)):
                obj = wkb_to_geojson_obj(bytes(v))
            else:
                sv = str(v).strip()
                if sv[:2] in ("\\x", "0x") or re.fullmatch(
                        r"[0-9A-Fa-f]+", sv or "-"):
                    obj = wkb_to_geojson_obj(sv)
                if obj is None:
                    obj = wkt_to_geojson_obj(sv)
            return json.dumps(obj) if obj else None
        return s.map(conv)

    import pandas as pd

    def series_udf(fn):
        return F.pandas_udf(
            lambda s: fn(s) if isinstance(s, pd.Series) else fn(pd.Series(s)),
            T.StringType())

    return (series_udf(_wkt_to_geojson), series_udf(_geojson_to_wkt),
            series_udf(_geometry_to_geojson))


_UDFS = None


def geo_udfs():
    """(wkt_to_geojson, geojson_to_wkt, geometry_to_geojson) pandas
    UDFs (built lazily: pandas_udf needs an active session config)."""
    global _UDFS
    if _UDFS is None:
        _UDFS = _make_udfs()
    return _UDFS
