"""Zero-dependency Avro Object Container File reader/writer (stdlib).

Reference: ``core/dbio/iop/avro.go`` (hamba/avro-backed reader). The
spark-avro datasource jar is not on this classpath, so like the xlsx
module this implements the subset sling needs directly from the PUBLIC
Avro 1.11 spec (avro.apache.org/docs/current/specification):

- OCF layout: magic ``Obj\\x01`` -> metadata map (``avro.schema``,
  ``avro.codec``) -> 16-byte sync marker -> blocks of
  ``(count, byte_size, data, sync)``.
- Binary encoding: zigzag-varint longs/ints, little-endian IEEE
  float/double, length-prefixed utf8 strings / bytes, 1-byte booleans,
  unions as ``(branch-index, value)``.
- Record schemas with primitive / nullable-union fields; arrays and
  maps of primitives.

``null`` and ``deflate`` codecs are supported (both stdlib). Files are
parsed on the driver and land in a DataFrame — the documented fallback
path; with the spark-avro jar present the native distributed reader in
``sources/files.py`` takes precedence.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

from sling_cli_spark.localframe import local_df

MAGIC = b"Obj\x01"


# --------------------------------------------------------------- encoding

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = _zigzag_encode(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _write_value(buf: io.BytesIO, schema: Any, v: Any) -> None:
    if isinstance(schema, list):  # union: branch index + value
        if v is None and "null" in schema:
            _write_long(buf, schema.index("null"))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        _write_long(buf, idx)
        _write_value(buf, schema[idx], v)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _write_value(buf, f["type"], v.get(f["name"])
                             if isinstance(v, dict) else getattr(v, f["name"]))
            return
        if t == "array":
            items = [x for x in (v or [])]
            if items:
                _write_long(buf, len(items))
                for x in items:
                    _write_value(buf, schema["items"], x)
            _write_long(buf, 0)
            return
        if t == "map":
            entries = list((v or {}).items())
            if entries:
                _write_long(buf, len(entries))
                for k, x in entries:
                    _write_bytes(buf, str(k).encode())
                    _write_value(buf, schema["values"], x)
            _write_long(buf, 0)
            return
        t_name = t
    else:
        t_name = schema
    if t_name == "null":
        return
    if t_name == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif t_name in ("int", "long"):
        _write_long(buf, int(v))
    elif t_name == "float":
        buf.write(struct.pack("<f", float(v)))
    elif t_name == "double":
        buf.write(struct.pack("<d", float(v)))
    elif t_name == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif t_name == "bytes":
        _write_bytes(buf, bytes(v))
    else:
        raise ValueError(f"unsupported avro type: {t_name!r}")


def _read_value(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):
        idx = _read_long(buf)
        return _read_value(buf, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _read_value(buf, f["type"])
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    out.append(_read_value(buf, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _read_value(buf, schema["values"])
        t_name = t
    else:
        t_name = schema
    if t_name == "null":
        return None
    if t_name == "boolean":
        return buf.read(1) == b"\x01"
    if t_name in ("int", "long"):
        return _read_long(buf)
    if t_name == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t_name == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t_name == "string":
        return _read_bytes(buf).decode("utf-8")
    if t_name == "bytes":
        return _read_bytes(buf)
    raise ValueError(f"unsupported avro type: {t_name!r}")


# -------------------------------------------------------------- container

def render_avro(
    records: list[dict], schema: dict,
    codec: str = "deflate", sync: bytes = b"\x07" * 16,
    block_records: int = 1000,
) -> bytes:
    """Records -> Avro OCF bytes (transport-agnostic)."""
    with io.BytesIO() as f:
        f.write(MAGIC)
        meta = io.BytesIO()
        entries = [("avro.schema", json.dumps(schema).encode()),
                   ("avro.codec", codec.encode())]
        _write_long(meta, len(entries))
        for k, v in entries:
            _write_bytes(meta, k.encode())
            _write_bytes(meta, v)
        _write_long(meta, 0)
        f.write(meta.getvalue())
        f.write(sync)
        for i in range(0, max(len(records), 1), block_records):
            block = records[i:i + block_records]
            if not block:
                break
            data = io.BytesIO()
            for r in block:
                _write_value(data, schema, r)
            payload = data.getvalue()
            if codec == "deflate":
                payload = zlib.compress(payload)[2:-4]  # raw deflate
            elif codec != "null":
                raise ValueError(f"unsupported codec: {codec!r}")
            head = io.BytesIO()
            _write_long(head, len(block))
            _write_long(head, len(payload))
            f.write(head.getvalue())
            f.write(payload)
            f.write(sync)
        return f.getvalue()


def write_avro(
    path: str, records: list[dict], schema: dict,
    codec: str = "deflate", sync: bytes = b"\x07" * 16,
    block_records: int = 1000,
) -> None:
    """Records -> one Avro OCF file (local path or any fsio URI)."""
    from sling_cli_spark import fsio

    data = render_avro(records, schema, codec=codec, sync=sync,
                       block_records=block_records)
    fsio.get_fs(path).write_bytes(path, data)


def parse_avro(raw: bytes, path: str = "<bytes>") -> tuple[dict, list[dict]]:
    """Avro OCF bytes -> (schema, records)."""
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    records: list[dict] = []
    while buf.tell() < len(raw):
        try:
            count = _read_long(buf)
        except EOFError:
            break
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec == "snappy":
            raise NotImplementedError("snappy codec needs python-snappy")
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec!r}")
        data = io.BytesIO(payload)
        for _ in range(count):
            records.append(_read_value(data, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Avro OCF file (local path or any fsio URI) -> (schema, records)."""
    from sling_cli_spark import fsio

    return parse_avro(fsio.get_fs(path).read_bytes(path), path)


# ----------------------------------------------------------- spark bridge

_SPARK_TO_AVRO = {
    "long": "long", "bigint": "long", "int": "int", "integer": "int",
    "smallint": "int", "double": "double", "float": "float",
    "string": "string", "boolean": "boolean", "binary": "bytes",
}


def schema_for_df(df) -> dict:
    """Spark schema -> nullable-union Avro record schema.

    Temporal/decimal columns carry Avro logical types (spec §Logical
    Types) so the fallback writer matches the jar-backed spark-avro
    output instead of silently degrading them to strings:
    timestamp -> long/timestamp-micros, timestamp_ntz ->
    long/local-timestamp-micros, date -> int/date, decimal(p,s) ->
    bytes/decimal."""
    fields = []
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        t: Any = _SPARK_TO_AVRO.get(tn)
        if t is None:
            if tn == "timestamp":
                t = {"type": "long", "logicalType": "timestamp-micros"}
            elif tn == "timestamp_ntz":
                t = {"type": "long", "logicalType": "local-timestamp-micros"}
            elif tn == "date":
                t = {"type": "int", "logicalType": "date"}
            elif tn == "decimal":
                t = {"type": "bytes", "logicalType": "decimal",
                     "precision": f.dataType.precision,
                     "scale": f.dataType.scale}
            else:
                t = "string"  # complex types serialize as JSON text
        fields.append({"name": f.name, "type": ["null", t]})
    return {"type": "record", "name": "row", "fields": fields}


_EPOCH_NAIVE = None  # set lazily to avoid importing datetime at module load


def _avro_cell_converter(avro_type):
    """Python-value converter for one field's (non-null branch) schema."""
    import datetime as _dt
    import decimal as _dec
    import time as _time

    if isinstance(avro_type, list):
        avro_type = next(t for t in avro_type if t != "null")
    lt = avro_type.get("logicalType") if isinstance(avro_type, dict) else None
    if lt == "timestamp-micros":
        def conv(v):
            # naive datetime in session-local tz -> epoch micros
            return (int(_time.mktime(v.timetuple())) * 1_000_000
                    + v.microsecond)
        return conv
    if lt == "local-timestamp-micros":
        epoch = _dt.datetime(1970, 1, 1)
        return lambda v: (v - epoch) // _dt.timedelta(microseconds=1)
    if lt == "date":
        epoch_d = _dt.date(1970, 1, 1)
        return lambda v: (v - epoch_d).days
    if lt == "decimal":
        scale = avro_type.get("scale", 0)

        def conv(v):
            unscaled = int(_dec.Decimal(v).scaleb(scale).to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            return unscaled.to_bytes(nbytes, "big", signed=True)
        return conv
    return None


def write_avro_df(df, path: str, codec: str = "deflate") -> None:
    """Driver-side Avro write (fallback when spark-avro is absent)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sling_cli_spark.limits import collect_capped

    cols = []
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            c = F.to_json(c)
        cols.append(c.alias(f.name))
    shaped = df.select(*cols)
    schema = schema_for_df(shaped)
    converters = {
        f["name"]: conv for f in schema["fields"]
        if (conv := _avro_cell_converter(f["type"])) is not None
    }
    rows = []
    for r in collect_capped(shaped, "stdlib avro write (sources/avro_py)",
                            "the spark-avro package (distributed writer)"):
        d = r.asDict()
        for name, conv in converters.items():
            if d[name] is not None:
                d[name] = conv(d[name])
        rows.append(d)
    write_avro(path, rows, schema, codec=codec)


def read_avro_df(spark, path: str):
    """Driver-side Avro read -> DataFrame (fallback path)."""
    import glob as _glob

    paths = sorted(_glob.glob(path)) if any(ch in path for ch in "*?[") \
        else [path]
    if len(paths) == 1 and os.path.isdir(paths[0]):
        paths = sorted(_glob.glob(os.path.join(paths[0], "*.avro")))
    from sling_cli_spark.limits import ensure_driver_bytes

    ensure_driver_bytes(
        sum(os.path.getsize(p) for p in paths if os.path.exists(p)),
        "stdlib avro read (sources/avro_py)",
        "the spark-avro package (distributed reader)")
    schema, records = None, []
    for p in paths:
        s, recs = read_avro(p)
        schema = schema or s
        records.extend(recs)
    if schema is None:
        raise FileNotFoundError(f"no avro files at {path!r}")

    def branch(avro_t):
        if isinstance(avro_t, list):
            avro_t = next(t for t in avro_t if t != "null")
        return avro_t

    def spark_type(avro_t):
        avro_t = branch(avro_t)
        if isinstance(avro_t, dict):
            lt = avro_t.get("logicalType")
            if lt == "timestamp-micros":
                return "timestamp"
            if lt == "local-timestamp-micros":
                return "timestamp_ntz"
            if lt == "date":
                return "date"
            if lt == "decimal":
                return (f"decimal({avro_t.get('precision', 38)},"
                        f"{avro_t.get('scale', 0)})")
            avro_t = avro_t.get("type")
        return {"long": "bigint", "int": "int", "double": "double",
                "float": "float", "string": "string", "boolean": "boolean",
                "bytes": "binary"}.get(avro_t, "string")

    def from_avro_conv(avro_t):
        """Inverse of _avro_cell_converter for the read path."""
        import datetime as _dt
        import decimal as _dec

        avro_t = branch(avro_t)
        lt = avro_t.get("logicalType") if isinstance(avro_t, dict) else None
        if lt == "timestamp-micros":
            # tz-AWARE UTC (ADVICE r14): an aware datetime is the same
            # instant on the classic and Arrow createDataFrame paths;
            # the old naive-local rendering shifted by the UTC offset
            # on a non-UTC driver under the Arrow fast path
            return lambda v: _dt.datetime.fromtimestamp(
                v // 1_000_000, _dt.timezone.utc) \
                + _dt.timedelta(microseconds=v % 1_000_000)
        if lt == "local-timestamp-micros":
            epoch = _dt.datetime(1970, 1, 1)
            return lambda v: epoch + _dt.timedelta(microseconds=v)
        if lt == "date":
            epoch_d = _dt.date(1970, 1, 1)
            return lambda v: epoch_d + _dt.timedelta(days=v)
        if lt == "decimal":
            scale = avro_t.get("scale", 0)
            return lambda v: _dec.Decimal(
                int.from_bytes(v, "big", signed=True)).scaleb(-scale)
        return None

    converters = {
        f["name"]: conv for f in schema["fields"]
        if (conv := from_avro_conv(f["type"])) is not None
    }
    ddl = ", ".join(
        f"`{f['name']}` {spark_type(f['type'])}" for f in schema["fields"])
    data = []
    for r in records:
        data.append(tuple(
            converters[f["name"]](r[f["name"]])
            if f["name"] in converters and r[f["name"]] is not None
            else r[f["name"]]
            for f in schema["fields"]))
    return local_df(spark, data, ddl)
