"""Named row-level transform registry.

Re-expresses the reference's transform surface
(``core/dbio/iop/transforms.go:52-89`` registry, ``:166-422`` definitions,
``:523-728`` implementations) as Catalyst column expressions — every
transform stays JVM-side / whole-stage-codegen'd; no Python row loops.

Config surface (matches the reference's ``transforms:`` option):

- list form  -> apply each named transform to every *applicable* column
  (string transforms apply to string columns only, matching the
  reference's per-type gating in ``stream_processor.go``)
- dict form  -> ``{column: [transform, ...]}`` applies per column
- entries may carry an argument: ``"date_format(yyyy-MM-dd)"``.

At 100 TB every one of these is a narrow projection over the scan —
no shuffle, no UDF, pruned/pushed like any other expression.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# transform implementations (reference file:line cited per entry)

# printable-hygiene regex: control chars except \t \n \r
# ReplaceNonPrintable (transforms.go): control chars 1-8 and 14-31 and
# NBSP become a SPACE; NUL/DEL/C1 controls, zero-width + directional
# marks, soft hyphen, object/replacement chars, and every other
# non-graphic rune are REMOVED; \t \n \x0b \x0c \r stay verbatim.
_NP_TO_SPACE = "[\\x01-\\x08\\x0e-\\x1f\\u00a0]"
_NP_REMOVE = ("[\\x00\\x7f\\x80-\\x9f\\u00ad\\u200b-\\u200f"
              "\\u202a-\\u202e\\u2060\\ufeff\\ufffc\\ufffd"
              "\\p{Cf}\\p{Co}\\p{Cn}\\p{Zl}\\p{Zp}]")


def _replace_non_printable(c: Column) -> Column:
    out = F.regexp_replace(c, _NP_TO_SPACE, " ")
    return F.regexp_replace(out, _NP_REMOVE, "")

_ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"


def _empty_as_null(c: Column) -> Column:
    # transforms.go:410-421 (EmptyAsNull)
    return F.when(c.cast("string") == "", F.lit(None)).otherwise(c)


def _parse_uuid(c: Column) -> Column:
    # transforms.go:303-322 ParseUUID: 16 raw bytes -> canonical uuid text
    h = F.lower(F.hex(c))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
        F.substring(h, 17, 4), F.substring(h, 21, 12),
    )


def _parse_ms_uuid(c: Column) -> Column:
    # transforms.go ParseMsUUID: first 3 groups little-endian (mixed-endian GUID)
    h = F.lower(F.hex(c))

    def swap4(start: int) -> Column:  # 4 bytes -> reversed byte order
        return F.concat(
            F.substring(h, start + 6, 2), F.substring(h, start + 4, 2),
            F.substring(h, start + 2, 2), F.substring(h, start, 2),
        )

    def swap2(start: int) -> Column:
        return F.concat(F.substring(h, start + 2, 2), F.substring(h, start, 2))

    return F.concat_ws(
        "-", swap4(1), swap2(9), swap2(13),
        F.substring(h, 17, 4), F.substring(h, 21, 12),
    )


def _parse_bit(c: Column) -> Column:
    # transforms.go ParseBit: 1-byte binary 0/1 -> "0"/"1"
    return F.conv(F.hex(c), 16, 10)


# FIX tag number -> snake_case field name. Well-known subset of the
# public FIX 4.x tag dictionary (the reference loads the full wireshark
# fix_mapping.tsv, transforms.go:446-481); unknown tags keep their
# numeric key, same fallback as the reference.
_FIX_TAGS = {
    1: "account", 6: "avg_px", 8: "begin_string", 9: "body_length",
    10: "check_sum", 11: "cl_ord_id", 14: "cum_qty", 15: "currency",
    17: "exec_id", 20: "exec_trans_type", 21: "handl_inst",
    22: "security_id_source", 30: "last_mkt", 31: "last_px",
    32: "last_qty", 34: "msg_seq_num", 35: "msg_type", 37: "order_id",
    38: "order_qty", 39: "ord_status", 40: "ord_type",
    41: "orig_cl_ord_id", 44: "price", 47: "rule80_a",
    48: "security_id", 49: "sender_comp_id", 52: "sending_time",
    54: "side", 55: "symbol", 56: "target_comp_id", 58: "text",
    59: "time_in_force", 60: "transact_time", 63: "settl_type",
    64: "settl_date", 75: "trade_date", 76: "exec_broker",
    98: "encrypt_method", 100: "ex_destination", 108: "heart_bt_int",
    110: "min_qty", 115: "on_behalf_of_comp_id",
    116: "on_behalf_of_sub_id", 119: "settl_curr_amt",
    120: "settl_currency", 126: "expire_time", 128: "deliver_to_comp_id",
    129: "deliver_to_sub_id", 150: "exec_type", 151: "leaves_qty",
    152: "cash_order_qty", 167: "security_type",
    207: "security_exchange",
}


# A hex PAIR (one byte) that marks data as "binary" per the reference's
# BinaryToDecimal scan: >0x7F, or a control char other than \t \n \r.
# Anchored by consuming whole pairs from the string start so a pattern
# can't straddle two bytes.
_BINARY_PAIR = r"^(?:[0-9A-F]{2})*?(?:[89A-F][0-9A-F]|0[0-8BCEF]|1[0-9A-F])"


def _binary_to_decimal(c: Column) -> Column:
    """MySQL BIT -> decimal string (transforms.go BinaryToDecimal):
    1-8 bytes of binary-looking data convert big-endian to an unsigned
    decimal; longer values and plain printable text pass through as-is
    (``b"hello"`` stays ``"hello"``). All-JVM: hex + one anchored regexp."""
    h = F.hex(c)
    return F.when(
        (F.length(c) > 0) & (F.length(c) <= 8) & h.rlike(_BINARY_PAIR),
        F.conv(h, 16, 10),
    ).otherwise(c.cast("string"))


def _parse_fix(c: Column) -> Column:
    """FIX message -> JSON object string (transforms.go:621-628 ParseFIX).

    All-JVM plan: delimiter normalization (SOH / ``|`` / newline /
    space-before-tag) with ``regexp_replace``, ONE ``str_to_map``, tag
    renaming via ``transform_keys`` against a foldable map literal, then
    ``to_json`` — no Python in the row path."""
    s = F.trim(c.cast("string"))
    s = F.regexp_replace(s, "[\x01|\n]+", "\x01")
    s = F.regexp_replace(s, r"\s+(?=[0-9]+=)", "\x01")  # space-delimited FIX
    s = F.regexp_replace(s, "\x01+", "\x01")  # " | " forms leave runs
    s = F.regexp_replace(s, "^\x01+|\x01+$", "")
    m = F.str_to_map(s, F.lit("\x01"), F.lit("="))
    tag_names = F.create_map(
        *[F.lit(x) for t, n in sorted(_FIX_TAGS.items())
          for x in (str(t), n)])
    renamed = F.transform_keys(
        m, lambda k, _v: F.coalesce(tag_names[F.trim(k)], F.trim(k)))
    return F.to_json(F.transform_values(renamed, lambda _k, v: F.trim(v)))


def _redecode(codec: str):
    """latin1-misread repair for a single-byte charset: translate each
    character whose ``codec`` glyph differs from its latin1 glyph."""
    src, dst = [], []
    for b in range(256):
        latin1_ch = bytes([b]).decode("latin1")
        try:
            actual = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            continue  # undefined byte in the charset: leave as-is
        if actual != latin1_ch:
            src.append(latin1_ch)
            dst.append(actual)
    smap, dmap = "".join(src), "".join(dst)
    return lambda c: F.translate(c, smap, dmap)


def _reencode(codec: str):
    """Encode twin of :func:`_redecode`: map each char to the latin1
    glyph of its ``codec`` byte, then take raw bytes (latin1 encode is
    byte-exact) — yields the string's bytes in the target charset.
    Codepoints the charset lacks pass through the JVM encoder's
    replacement (same stance as the reference's encoder)."""
    src, dst = [], []
    for b in range(256):
        latin1_ch = bytes([b]).decode("latin1")
        try:
            actual = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            continue
        if actual != latin1_ch:
            src.append(actual)
            dst.append(latin1_ch)
    smap, dmap = "".join(src), "".join(dst)
    return lambda c: F.encode(F.translate(c, smap, dmap), "ISO-8859-1")


# name -> (fn, applies_to) where applies_to gates list-form application by
# Spark type class: 'string' | 'binary' | 'any' | 'temporal'
_REGISTRY: dict[str, tuple[Callable[[Column], Column], str]] = {
    # hashing (transforms.go:303-322, 630-642)
    "hash_md5": (lambda c: F.md5(c.cast("string")), "any"),
    "hash_sha256": (lambda c: F.sha2(c.cast("string"), 256), "any"),
    "hash_sha512": (lambda c: F.sha2(c.cast("string"), 512), "any"),
    # string hygiene (transforms.go:366-407, 612-628, 644-727)
    "trim_space": (F.trim, "string"),
    "lower": (F.lower, "string"),
    "upper": (F.upper, "string"),
    "replace_accents": (
        lambda c: F.translate(c, _ACCENT_SRC, _ACCENT_DST), "string"),
    "replace_0x00": (lambda c: F.regexp_replace(c, "\x00", ""), "string"),
    "replace_non_printable": (_replace_non_printable, "string"),
    "empty_as_null": (_empty_as_null, "string"),
    # is_empty -> boolean (the expression function surfaced as a stream
    # transform; r.35.transform_functions_test.yaml)
    "is_empty": (lambda c: c.isNull() | (c.cast("string") == ""), "any"),
    # parsing (transforms.go:303-365)
    "parse_uuid": (_parse_uuid, "binary"),
    "parse_ms_uuid": (_parse_ms_uuid, "binary"),
    "parse_bit": (_parse_bit, "binary"),
    "binary_to_hex": (lambda c: F.hex(c), "binary"),
    "binary_to_decimal": (_binary_to_decimal, "binary"),
    # list/json (transforms.go:231-236 duckdb_list_to_text)
    "list_to_text": (lambda c: F.concat_ws(",", c), "any"),
    # FIX protocol -> JSON (transforms.go:344-348, 429-521, 621-628)
    "parse_fix": (_parse_fix, "string"),
    # encoding fix-ups (transforms.go:52-120 TransformDecode*): the
    # common misread is bytes of charset X decoded as latin1. Because
    # latin1 maps byte<->codepoint 1:1, the repair is a per-character
    # substitution — F.translate with the charset's difference map, fully
    # JVM-side. decode_utf8/latin1 are identity (already correct bytes).
    "decode_utf8": (lambda c: c, "string"),
    "decode_utf8_bom": (lambda c: F.regexp_replace(c, "^﻿", ""), "string"),
    "decode_latin1": (lambda c: c, "string"),
    "decode_windows1250": (_redecode("windows-1250"), "string"),
    "decode_windows1252": (_redecode("windows-1252"), "string"),
    "decode_latin5": (_redecode("iso-8859-9"), "string"),
    "decode_latin9": (_redecode("iso-8859-15"), "string"),
    # utf-16 isn't per-char: recover the raw bytes (latin1 encode is
    # byte-exact) and decode as UTF-16 — both charsets Spark supports
    "decode_utf16": (
        lambda c: F.decode(F.encode(c, "ISO-8859-1"), "UTF-16"), "string"),
    # encode twins (transforms.go TransformEncode*): string -> bytes in
    # the target charset, for writing legacy-encoded outputs
    "encode_utf8": (lambda c: F.encode(c, "UTF-8"), "string"),
    "encode_utf8_bom": (
        lambda c: F.concat(F.lit(b"\xef\xbb\xbf"), F.encode(c, "UTF-8")),
        "string"),
    "encode_latin1": (lambda c: F.encode(c, "ISO-8859-1"), "string"),
    "encode_utf16": (lambda c: F.encode(c, "UTF-16"), "string"),
    "encode_windows1250": (_reencode("windows-1250"), "string"),
    "encode_windows1252": (_reencode("windows-1252"), "string"),
    "encode_latin5": (_reencode("iso-8859-9"), "string"),
    "encode_latin9": (_reencode("iso-8859-15"), "string"),
    # geometry conversions (datastream.go:2526-2574 geometry->GeoJSON;
    # operators/geo.py pandas-UDF codecs — parsing is not expressible in
    # Catalyst built-ins)
    "geometry_to_geojson": (
        lambda c: __import__(
            "sling_cli_spark.operators.geo", fromlist=["geo_udfs"]
        ).geo_udfs()[2](c), "any"),
    "wkt_to_geojson": (
        lambda c: __import__(
            "sling_cli_spark.operators.geo", fromlist=["geo_udfs"]
        ).geo_udfs()[0](c), "string"),
    "geojson_to_wkt": (
        lambda c: __import__(
            "sling_cli_spark.operators.geo", fromlist=["geo_udfs"]
        ).geo_udfs()[1](c), "string"),
}

# argument-taking transforms: name(arg, ...) — each function receives
# the PARSED argument list (one str per top-level comma, quotes already
# stripped), never a re-joined comma string: a quoted literal containing
# a comma (replace(value, "a,b", "x")) must survive intact (ADVICE r12).
_ARG_REGISTRY: dict[str, Callable[..., Column]] = {
    # date/time formatting seen in the reference test suite
    # (tests/suite.db.template.yaml:6)
    "date_format": lambda c, fmt: F.date_format(c, fmt),
    "date_add": lambda c, n: F.date_add(c, int(n)),
    "date_trunc": lambda c, unit: F.date_trunc(unit, c),
    "date_timezone": lambda c, tz: F.from_utc_timestamp(c, tz),
    # bare "decimal" must not collapse to Spark's decimal(10,0): use the
    # engine's default sizing (matches expr_compile._CAST_TYPES)
    "cast": lambda c, t: c.cast(
        {"decimal": "decimal(24,6)", "integer": "bigint", "int": "bigint",
         "float": "double", "text": "string", "datetime": "timestamp",
         "bool": "boolean"}.get(t.strip().lower(), t)),
    # args arrive pre-stripped (unquoted) or verbatim (quoted) from
    # _split_call_args — no re-splitting, quoted commas stay literal
    "replace": lambda c, pat, rep="": F.regexp_replace(c, pat, rep),
    "substring": lambda c, start, length: F.substring(
        c, int(start), int(length)),
}

_CALL_RE = re.compile(r"^([a-z_0-9]+)\((.*)\)$")


def _split_call_args(arg: str) -> list[str]:
    """Split a call's argument text on top-level commas (quoted runs
    stay intact)."""
    parts, buf, q = [], [], None
    for ch in arg:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
            buf.append(ch)
        elif ch == ",":
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "\"'":
        return s[1:-1]
    return s


def transform_column(col: Column, name: str) -> Column:
    """Apply one named transform (possibly with ``name(args)`` syntax).

    The stage-transform expression form ``fn(value, "literal")`` —
    where ``value`` stands for the current column — is accepted too:
    the leading ``value`` token drops (the column is already the first
    argument) and quoted literals unquote. The reference OSS build
    STUBS stage transforms entirely (transforms.go:126 "please use the
    official release"); the suite's case-1 ``date_timezone(value,
    "America/New_York")`` runs here for real."""
    m = _CALL_RE.match(name.strip())
    if m:
        fn_name, arg = m.group(1), m.group(2)
        args = _split_call_args(arg)
        if args and args[0] == "value":
            args = args[1:]
        if fn_name in _ARG_REGISTRY:
            return _ARG_REGISTRY[fn_name](col, *[_unquote(a) for a in args])
        if fn_name in _REGISTRY and not args:
            return _REGISTRY[fn_name][0](col)  # e.g. lower(value)
        raise ValueError(f"unknown transform: {fn_name!r}")
    if name not in _REGISTRY:
        raise ValueError(f"unknown transform: {name!r}")
    return _REGISTRY[name][0](col)


def _applies(name: str, dtype: T.DataType) -> bool:
    gate = _REGISTRY.get(name.strip(), (None, "any"))[1]
    if gate == "string":
        return isinstance(dtype, T.StringType)
    if gate == "binary":
        return isinstance(dtype, T.BinaryType)
    if gate == "temporal":
        return isinstance(dtype, (T.DateType, T.TimestampType,
                                  T.TimestampNTZType))
    return True


def apply_transforms(df: DataFrame, transforms) -> DataFrame:
    """Apply the config ``transforms`` surface (list or dict form).

    One single ``select`` projection regardless of how many transforms are
    configured — Catalyst collapses the chain, keeping one codegen stage.
    """
    if not transforms:
        return df
    if isinstance(transforms, list) and transforms \
            and all(isinstance(t, dict) for t in transforms):
        # STAGED form (list of dicts): goval expressions over
        # value/record.*, new computed columns, "*" wildcards —
        # compiled per stage to one Catalyst projection
        # (operators/expr_compile.py; corpus r.44/r.97)
        from sling_cli_spark.operators.expr_compile import (
            apply_staged_transforms)

        return apply_staged_transforms(df, transforms)
    per_col: dict[str, list[str]] = {}
    if isinstance(transforms, dict):
        lower_map = {c.lower(): c for c in df.columns}
        for col, names in transforms.items():
            actual = lower_map.get(col.lower())
            if actual is None:
                raise ValueError(f"transforms: column not found: {col!r}")
            per_col[actual] = names if isinstance(names, list) else [names]
    else:  # list form: every applicable column
        names = transforms if isinstance(transforms, list) else [transforms]
        fields = {f.name: f.dataType for f in df.schema.fields}
        for col in df.columns:
            applicable = [n for n in names
                          if _CALL_RE.match(n.strip()) or _applies(n, fields[col])]
            if applicable:
                per_col[col] = applicable

    exprs = []
    for col in df.columns:
        c = F.col(f"`{col}`")
        for name in per_col.get(col, []):
            c = transform_column(c, name)
        exprs.append(c.alias(col))
    return df.select(*exprs)
