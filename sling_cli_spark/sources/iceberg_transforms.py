"""Iceberg partition transforms (spec §Partition Transforms):
``identity``, ``bucket[N]``, ``truncate[W]``, ``year``, ``month``,
``day``, ``hour``, ``void`` — both as Spark Column expressions (the
write path derives partition values JVM-side) and as driver-side
Python twins (the read path transforms filter LITERALS to prune
manifests' partition values).

Reference surface: the reference reads transform-partitioned tables
via DuckDB's iceberg extension (core/dbio/iop/iceberg.go:1-40); this
module implements the spec directly so the engine can also WRITE and
PRUNE transform layouts.

Scale shape: every transform of an int/long/date/timestamp source —
including ``bucket[N]``'s murmur3_x86_32 — is a pure Catalyst
expression (whole-stage codegen, no Python on the data path). The
32-bit wraparound arithmetic murmur3 needs is emulated in long space
with explicit masks (max intermediate < 2^48, ANSI-safe), and the
per-block state threading rides ``F.aggregate`` over the two 4-byte
blocks so the expression tree stays CONSTANT-size (lambda variables
are evaluated once; naive substitution would blow up exponentially).
Only ``bucket`` over string/binary sources — variable-length murmur3
input — drops to an Arrow-batched pandas UDF.

Bucket hashing follows spec Appendix B exactly: int/long/date hash as
the 8-byte little-endian long, timestamps as microseconds-from-epoch,
strings as UTF-8 bytes, seed 0; ``bucket = (hash & Int.MAX) % N``.
Verified against the spec's test vectors (34 -> 2017239379,
"iceberg" -> 1210000089, date 17486 -> -653330422) in
tests/test_iceberg_transforms.py.
"""

from __future__ import annotations

import datetime
import re
import struct

_M32 = 0xFFFFFFFF
_EPOCH = datetime.date(1970, 1, 1)

# SQL-ish syntax accepted in partition_by entries
_RX_BUCKET = re.compile(r"^bucket\(\s*(\d+)\s*,\s*(\w+)\s*\)$", re.I)
_RX_TRUNC = re.compile(r"^truncate\(\s*(\d+)\s*,\s*(\w+)\s*\)$", re.I)
_RX_UNARY = re.compile(
    r"^(identity|year|month|day|hour|void)\(\s*(\w+)\s*\)$", re.I)
# spec-style transform strings recorded in metadata
_RX_SPEC_BUCKET = re.compile(r"^bucket\[(\d+)\]$")
_RX_SPEC_TRUNC = re.compile(r"^truncate\[(\d+)\]$")


def parse_partition_field(entry: str) -> tuple[str, str, str]:
    """One ``partition_by`` entry -> (transform, source_col, field_name)
    with the spec's transform string and Java-implementation default
    field naming (``col_bucket``, ``col_trunc``, ``col_year``, ...).
    A bare column name is identity (field name = source name)."""
    e = entry.strip()
    m = _RX_BUCKET.match(e)
    if m:
        n, col = int(m.group(1)), m.group(2)
        if n <= 0:
            raise ValueError(f"bucket count must be positive: {entry}")
        return f"bucket[{n}]", col, f"{col}_bucket"
    m = _RX_TRUNC.match(e)
    if m:
        w, col = int(m.group(1)), m.group(2)
        if w <= 0:
            raise ValueError(f"truncate width must be positive: {entry}")
        return f"truncate[{w}]", col, f"{col}_trunc"
    m = _RX_UNARY.match(e)
    if m:
        t, col = m.group(1).lower(), m.group(2)
        if t == "identity":
            return "identity", col, col
        return t, col, f"{col}_{t}"
    if re.match(r"^\w+$", e):
        return "identity", e, e
    raise ValueError(
        f"unparseable partition field {entry!r}; expected a column "
        "name or transform(col) with transform in bucket(N, col) / "
        "truncate(W, col) / year / month / day / hour / void")


_RX_SORT_TAIL = re.compile(
    r"(?:\s+(asc|desc))?(?:\s+nulls[-_ ](first|last))?\s*$", re.I)


def parse_sort_field(entry: str) -> dict:
    """One ``order_by`` entry -> a spec §Sort Orders field dict
    (minus ``source-id``, which the caller resolves from the schema):
    ``"col"``, ``"col desc"``, ``"truncate(4, col) asc nulls-last"``.
    Defaults follow the spec's SQL mapping: ``asc`` -> nulls-first,
    ``desc`` -> nulls-last."""
    m = _RX_SORT_TAIL.search(entry)
    direction = (m.group(1) or "asc").lower()
    nulls = m.group(2)
    null_order = f"nulls-{nulls.lower()}" if nulls else (
        "nulls-first" if direction == "asc" else "nulls-last")
    transform, src, _ = parse_partition_field(entry[:m.start()])
    return {"transform": transform, "source": src,
            "direction": direction, "null-order": null_order}


def _bucket_n(transform: str) -> int:
    m = _RX_SPEC_BUCKET.match(transform)
    if not m:
        raise ValueError(f"not a bucket transform: {transform}")
    return int(m.group(1))


def _trunc_w(transform: str) -> int:
    m = _RX_SPEC_TRUNC.match(transform)
    if not m:
        raise ValueError(f"not a truncate transform: {transform}")
    return int(m.group(1))


# --------------------------------------------------------------------
# murmur3_x86_32, seed 0 — Python scalar twin (literals, string UDF)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Standard murmur3_x86_32 -> SIGNED int32 (spec Appendix B)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4:(i + 1) * 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _hash_long(v: int) -> int:
    return murmur3_32(struct.pack("<q", v))


def _decimal_bytes(unscaled: int) -> bytes:
    """Minimal big-endian two's-complement of a decimal's UNSCALED
    value — the byte layout spec Appendix B hashes (1420 -> 0x058C ->
    -500754589, verified in tests)."""
    return unscaled.to_bytes(
        max(1, (unscaled.bit_length() + 8) // 8), "big", signed=True)


# --------------------------------------------------------------------
# Catalyst murmur3 for 8-byte (long) input


def _mul32(x, c: int):
    """(x * c) mod 2^32 for a nonneg-32-bit long Column x and a 32-bit
    constant c, without ever exceeding 2^48 (ANSI-safe)."""
    from pyspark.sql import functions as F

    lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
    hi = F.shiftleft(
        (F.shiftright(x, 16) * F.lit(c)).bitwiseAND(F.lit(0xFFFF)), 16)
    return (lo + hi).bitwiseAND(F.lit(_M32))


def _rotl32(x, r: int):
    from pyspark.sql import functions as F

    return (F.shiftleft(x, r)
            .bitwiseOR(F.shiftright(x, 32 - r))).bitwiseAND(F.lit(_M32))


def _mix_k1(k):
    return _mul32(_rotl32(_mul32(k, 0xCC9E2D51), 15), 0x1B873593)


def _mix_h1(h, k):
    from pyspark.sql import functions as F

    return (_mul32(_rotl32(h.bitwiseXOR(k), 13), 5)
            + F.lit(0xE6546B64)).bitwiseAND(F.lit(_M32))


def murmur3_long_expr(v):
    """murmur3_x86_32(little_endian_8_bytes(v), seed=0) as an UNSIGNED
    32-bit value in a long Column — pure Catalyst. ``v`` must be a
    long Column. Null in -> null out."""
    from pyspark.sql import functions as F

    k1 = v.bitwiseAND(F.lit(_M32))
    k2 = F.shiftright(v, 32).bitwiseAND(F.lit(_M32))
    # thread h through the two blocks with aggregate(): the lambda
    # variables keep each sub-expression evaluated once
    h = F.aggregate(
        F.array(k1, k2), F.lit(0).cast("long"),
        lambda acc, k: _mix_h1(acc, _mix_k1(k)))
    # finalization: wrap h in one more single-element aggregate so the
    # fmix avalanche references a lambda VARIABLE, not the whole tree
    def _fmix(hh):
        hh = hh.bitwiseXOR(F.lit(8))  # input length in bytes
        hh = hh.bitwiseXOR(F.shiftright(hh, 16))
        hh = _mul32(hh, 0x85EBCA6B)
        hh = hh.bitwiseXOR(F.shiftright(hh, 13))
        hh = _mul32(hh, 0xC2B2AE35)
        return hh.bitwiseXOR(F.shiftright(hh, 16))

    return F.aggregate(F.array(h), F.lit(0).cast("long"),
                       lambda _acc, hh: _fmix(hh))


# --------------------------------------------------------------------
# Spark Column transforms

_INTEGRAL = {"integer", "long", "short", "byte"}


def _days_expr(col, type_name: str):
    from pyspark.sql import functions as F

    if type_name == "date":
        return F.unix_date(col)
    # timestamps: pure epoch arithmetic (no session-timezone calendar),
    # floor division so pre-1970 instants land in the correct day
    return F.floor(F.unix_micros(col) / F.lit(86_400_000_000)) \
        .cast("int")


def transform_expr(transform: str, col, type_name: str):
    """Spark Column computing ``transform`` of source Column ``col``
    whose Spark typeName is ``type_name``. Raises
    UnsupportedTransform for (transform, type) pairs outside the
    supported matrix — the caller converts to its refusal type."""
    from pyspark.sql import functions as F

    if transform == "identity":
        return col
    if transform == "void":
        return F.lit(None).cast("int")
    if transform in ("year", "month", "day", "hour"):
        if type_name not in ("date", "timestamp", "timestamp_ntz"):
            raise UnsupportedTransform(
                f"{transform} transform needs a date/timestamp source, "
                f"got {type_name}")
        if transform == "hour":
            if type_name == "date":
                raise UnsupportedTransform(
                    "hour transform is undefined for date sources")
            return F.floor(F.unix_micros(col) / F.lit(3_600_000_000)) \
                .cast("int")
        days = _days_expr(col, type_name)
        if transform == "day":
            return days
        d = F.date_from_unix_date(days)  # timezone-free calendar
        if transform == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        return ((F.year(d) - F.lit(1970)) * F.lit(12)
                + F.month(d) - F.lit(1)).cast("int")
    if _RX_SPEC_TRUNC.match(transform):
        w = _trunc_w(transform)
        if type_name in _INTEGRAL:
            return (col - F.pmod(col, F.lit(w))).cast(
                "long" if type_name == "long" else "int")
        if type_name == "string":
            return F.substring(col, 1, w)
        if _RX_DECIMAL.match(type_name):
            # spec: W applies to the UNSCALED value — decimal(10,2)
            # truncate[50] rounds down to 0.50 increments
            import decimal

            s = _decimal_scale(type_name)
            ws = decimal.Decimal(w).scaleb(-s)
            return (col - F.pmod(col, F.lit(ws))).cast(type_name)
        raise UnsupportedTransform(
            f"truncate transform over {type_name} is not supported "
            "(int/long/string/decimal sources only)")
    if _RX_SPEC_BUCKET.match(transform):
        n = _bucket_n(transform)
        if type_name in _INTEGRAL:
            as_long = col.cast("long")
        elif type_name == "date":
            as_long = F.unix_date(col).cast("long")
        elif type_name in ("timestamp", "timestamp_ntz"):
            as_long = F.unix_micros(col)
        elif type_name in ("string", "binary"):
            return _bucket_bytes_udf(n, type_name)(col)
        elif _RX_DECIMAL.match(type_name):
            return _bucket_decimal_udf(n, _decimal_scale(type_name))(col)
        else:
            raise UnsupportedTransform(
                f"bucket transform over {type_name} is not supported "
                "(int/long/date/timestamp/string/binary/decimal "
                "sources only)")
        h = murmur3_long_expr(as_long)
        return F.pmod(h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n)) \
            .cast("int")
    raise UnsupportedTransform(f"unknown transform {transform!r}")


def _bucket_bytes_udf(n: int, type_name: str):
    """Arrow-batched bucket for variable-length sources (strings /
    binary) — murmur3 has no fixed-width Catalyst unrolling here."""
    import pandas as pd
    from pyspark.sql import functions as F

    if type_name == "string":
        def _enc(x):
            return x.encode("utf-8")
    else:
        def _enc(x):
            return bytes(x)

    def _bucket(s):
        return s.map(lambda x: None if x is None
                     else (murmur3_32(_enc(x)) & 0x7FFFFFFF) % n)

    # annotations set eagerly: `from __future__ import annotations`
    # would stringify them out of pandas_udf's type-hint inference
    _bucket.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_bucket, "int")


def _bucket_decimal_udf(n: int, scale: int):
    """Arrow-batched decimal bucket: minimal big-endian
    two's-complement of the unscaled value (spec Appendix B; the 14.20
    -> -500754589 vector is pinned in tests)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _bucket(s):
        return s.map(
            lambda x: None if x is None
            else (murmur3_32(_decimal_bytes(
                int(_quantized(x, scale).scaleb(scale))))
                & 0x7FFFFFFF) % n)

    _bucket.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_bucket, "int")


class UnsupportedTransform(ValueError):
    pass


_RX_DECIMAL = re.compile(r"^decimal\((\d+),\s*(-?\d+)\)$")


def spark_type_name(dt) -> str:
    """DataType -> the name transform_expr keys on: typeName() for
    atomics, simpleString() for decimals (typeName loses (p,s) and
    the scale determines both truncate width scaling and the unscaled
    value bucket hashing operates on)."""
    n = dt.typeName()
    return dt.simpleString() if n == "decimal" else n


def _decimal_scale(type_name: str) -> int:
    m = _RX_DECIMAL.match(type_name)
    if not m:
        raise UnsupportedTransform(f"not a decimal type: {type_name}")
    return int(m.group(2))


def _quantized(v, scale: int):
    import decimal

    d = v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))
    return d.quantize(decimal.Decimal(1).scaleb(-scale))


# --------------------------------------------------------------------
# Python literal twins (driver-side pruning)


def _to_days(v) -> int:
    if isinstance(v, datetime.datetime):
        return (v.date() - _EPOCH).days
    if isinstance(v, datetime.date):
        return (v - _EPOCH).days
    if isinstance(v, str):
        return (datetime.date.fromisoformat(v[:10]) - _EPOCH).days
    return int(v)


def _to_micros(v) -> int:
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, str):
        return _to_micros(datetime.datetime.fromisoformat(v))
    return int(v)


def transform_literal(transform: str, v, type_name: str):
    """Python twin of :func:`transform_expr` over one literal — what
    the pruner applies to a FILTER value before comparing it against
    manifests' recorded partition values. None -> None."""
    if v is None:
        return None
    if transform == "identity":
        return v
    if transform == "void":
        return None
    if transform == "year":
        d = _EPOCH + datetime.timedelta(days=_to_days(v))
        return d.year - 1970
    if transform == "month":
        d = _EPOCH + datetime.timedelta(days=_to_days(v))
        return (d.year - 1970) * 12 + d.month - 1
    if transform == "day":
        return _to_days(v)
    if transform == "hour":
        m = _to_micros(v)
        return m // 3_600_000_000
    if _RX_SPEC_TRUNC.match(transform):
        w = _trunc_w(transform)
        if isinstance(v, str):
            return v[:w]
        if type_name and _RX_DECIMAL.match(type_name):
            import decimal

            s = _decimal_scale(type_name)
            ws = decimal.Decimal(w).scaleb(-s)
            q = _quantized(v, s)
            r = q % ws  # floor remainder (spec: v % W must be >= 0)
            if r < 0:
                r += ws
            return q - r
        return int(v) - (int(v) % w)
    if _RX_SPEC_BUCKET.match(transform):
        n = _bucket_n(transform)
        if type_name and _RX_DECIMAL.match(type_name):
            s = _decimal_scale(type_name)
            h = murmur3_32(_decimal_bytes(
                int(_quantized(v, s).scaleb(s))))
        elif isinstance(v, str):
            h = murmur3_32(v.encode("utf-8"))
        elif isinstance(v, (bytes, bytearray)):
            h = murmur3_32(bytes(v))
        elif isinstance(v, datetime.datetime):
            h = _hash_long(_to_micros(v))
        elif isinstance(v, datetime.date):
            h = _hash_long(_to_days(v))
        else:
            h = _hash_long(int(v))
        return (h & 0x7FFFFFFF) % n
    raise UnsupportedTransform(f"unknown transform {transform!r}")


def transform_partition_disprove(
    transform: str, part_value: str | None, op: str, val,
    type_name: str,
) -> bool:
    """True when a file's recorded TRANSFORMED partition value proves
    no row can satisfy ``source_col <op> val``. Conservative: any
    doubt (null partition, unparsable value, op the transform can't
    reason about) keeps the file.

    The kernel: every monotonic transform t maps a source interval to
    one partition value, so a file at partition p holds only rows with
    t(row) == p — comparing t(val) against p decides range predicates;
    bucket is non-monotonic, so only equality prunes."""
    if part_value is None or val is None:
        return False
    try:
        if _RX_SPEC_BUCKET.match(transform):
            if op != "=":
                return False
            return int(part_value) != transform_literal(
                transform, val, type_name)
        if transform in ("year", "month", "day", "hour"):
            t = int(part_value)
            u = transform_literal(transform, val, type_name)
            if op == "=":
                return t != u
            # monotonic: t < u -> every row < val; t > u -> every > val
            if op in (">", ">="):
                return t < u
            if op in ("<", "<="):
                return t > u
            return False
        if _RX_SPEC_TRUNC.match(transform):
            w = _trunc_w(transform)
            if isinstance(val, str) or type_name == "string":
                p = str(part_value)
                sval = str(val)
                if op == "=":
                    return sval[:w] != p
                # rows share prefix p, so row >= p lexicographically
                if op in ("<", "<="):
                    return p > sval
                return False
            t = int(part_value)  # rows in [t, t + w)
            u = int(val)
            if op == "=":
                return u < t or u >= t + w
            if op == ">":
                return t + w - 1 <= u
            if op == ">=":
                return t + w - 1 < u
            if op == "<":
                return t >= u
            if op == "<=":
                return t > u
            return False
    except Exception:
        return False
    return False


def spec_transform_fields(meta: dict) -> dict[str, tuple[str, str, str]]:
    """All NON-identity partition fields across every recorded spec:
    field name -> (transform, source column name, source Spark
    typeName). Used by the pruner (a filter on the SOURCE column
    prunes via the transformed partition value) and the merge probe."""
    # local import to avoid a cycle at module load
    from sling_cli_spark.sources.iceberg_py import (
        _current_schema, _spark_schema)

    cur = _current_schema(meta) or {"fields": []}
    by_id = {f["id"]: f["name"] for f in cur.get("fields", [])}
    types = {f.name: spark_type_name(f.dataType)
             for f in _spark_schema(meta).fields}
    out: dict[str, tuple[str, str, str]] = {}
    for s in meta.get("partition-specs") or []:
        for f in s.get("fields") or []:
            t = f.get("transform", "identity")
            if t == "identity" or t == "void":
                continue
            src = by_id.get(f.get("source-id"))
            if src is None or src not in types:
                continue
            out[f["name"]] = (t, src, types[src])
    return out
