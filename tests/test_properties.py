"""Property-based tests (hypothesis) for the pure driver-side logic:
type widening, select parsing, partition masks, state store, intervals."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from sling_cli_spark.operators.select import parse_select_expr
from sling_cli_spark.sinks.writers import parse_partition_mask
from sling_cli_spark.types import ColumnType, widen

TYPES = list(ColumnType)


@given(st.sampled_from(TYPES), st.sampled_from(TYPES))
def test_widen_commutative(a, b):
    assert widen(a, b) == widen(b, a)


@given(st.sampled_from(TYPES))
def test_widen_idempotent(a):
    assert widen(a, a) == a


@given(st.sampled_from(TYPES), st.sampled_from(TYPES),
       st.sampled_from(TYPES))
def test_widen_never_narrows_to_unrelated(a, b, c):
    # widening twice is the same as widening with the widened result —
    # associativity over the lattice
    assert widen(widen(a, b), c) == widen(a, widen(b, c))


_ident = st.text(alphabet=string.ascii_lowercase + "_", min_size=1,
                 max_size=12).filter(lambda s: not s.startswith("_"))


@given(_ident)
def test_parse_plain_roundtrip(name):
    assert parse_select_expr(name) == (name, None, None, False)


@given(_ident)
def test_parse_exclude_roundtrip(name):
    got = parse_select_expr(f"-{name}")
    assert got == (name, None, None, True)


@given(_ident, _ident)
def test_parse_alias_roundtrip(name, alias):
    got_name, got_alias, cast, neg = parse_select_expr(f"{name} as {alias}")
    assert (got_name, got_alias, neg) == (name, alias, False)


@given(_ident, st.sampled_from(["int", "bigint", "string", "double"]))
def test_parse_cast_roundtrip(name, typ):
    got_name, alias, cast, neg = parse_select_expr(f"{name}::{typ}")
    assert (got_name, cast, neg) == (name, typ, False)


@given(_ident)
def test_mask_with_column_always_parses(col):
    uri, parts = parse_partition_mask(f"/d/{{part_year({col})}}")
    assert parts == [("part_year", col)]


def test_state_store_values_roundtrip(tmp_path):
    from sling_cli_spark.state import StateStore

    st_ = StateStore(str(tmp_path / "s.json"))
    for v in [0, -5, 3.5, "x", "2024-01-01T00:00:00", None]:
        st_.set("k", v)
        assert st_.get("k") == v


@given(st.integers(min_value=1, max_value=500),
       st.sampled_from(["second", "minute", "hour", "day"]))
def test_interval_seconds(n, unit):
    from sling_cli_spark.operators.asof import _interval_seconds

    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    assert _interval_seconds(f"{n} {unit}s") == n * mult[unit]
    assert _interval_seconds(f"{n} {unit}") == n * mult[unit]


# --- expression evaluator properties ------------------------------------

_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**9, 10**9),
    st.text(string.ascii_letters + string.digits + " _-", max_size=20))
_state_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(string.ascii_lowercase + "_", min_size=1, max_size=8),
            children, max_size=4)),
    max_leaves=10)
_paths = st.lists(
    st.text(string.ascii_lowercase + "_", min_size=1, max_size=8),
    min_size=1, max_size=4).map(".".join)


@given(_paths, st.dictionaries(
    st.text(string.ascii_lowercase + "_", min_size=1, max_size=8),
    _state_values, max_size=5))
@settings(max_examples=200)
def test_search_path_never_raises(path, state):
    from sling_cli_spark.expressions import search_path

    search_path(path, state)  # any (path, state) combo: None or a value


@given(_paths)
@settings(max_examples=100)
def test_missing_prefixed_paths_render_empty(path):
    from sling_cli_spark.expressions import Evaluator

    ev = Evaluator(state={"state": {}})
    out = ev.render("v=" + "{state." + path + "}!")
    assert out == "v=!"


@given(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6))
@settings(max_examples=100)
def test_arithmetic_matches_python(a, b):
    from sling_cli_spark.expressions import Evaluator

    ev = Evaluator(state={"state": {"a": a, "b": b}})
    assert ev.render("{state.a + state.b}") == a + b
    assert ev.render("{state.a > state.b}") == (a > b)
    assert ev.render("{state.a == state.b ? 1 : 0}") == (1 if a == b else 0)


@given(st.text(max_size=60))
@settings(max_examples=200)
def test_find_matches_never_raises(text):
    from sling_cli_spark.expressions import find_matches

    find_matches(text)  # arbitrary text: no crash, any result ok


def test_md5_hash60_matches_duckdb_on_arbitrary_text(spark):
    """Five oracle queries (jaccard/minhash/simhash/fingerprint + the
    shared shingle pipeline) rest on Spark's
    conv(substr(md5(x),1,15),16,10) equaling DuckDB's
    ('0x'||substr(md5(x),1,15))::BIGINT for every string. Pin the
    cross-engine agreement on a hypothesis-generated corpus (hashing
    operates on UTF-8 bytes, so unicode quirks are in scope)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sling_cli_spark.operators.dedup import md5_hash60

    samples: list[str] = []

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def collect(s):
        samples.append(s)

    collect()
    samples.extend(["", " ", "a b c", "é中\U0001f600"])

    from pyspark.sql import functions as F
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"]
           for r in df.select("s", md5_hash60(F.col("s")).alias("h"))
           .collect()}
    con = duckdb.connect()
    for s in samples:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[s] == want, (s, got[s], want)


# ------------------------------------------------ DV binary codecs (r8)

@given(st.lists(st.integers(min_value=0, max_value=1 << 40),
                max_size=300))
@settings(max_examples=150, deadline=None)
def test_roaring_bitmap_roundtrip(indices):
    """Delta RoaringBitmapArray portable serialization: serialize ->
    deserialize is the identity on any sorted-deduped index set,
    including multi-high-key (>2^32) values."""
    from sling_cli_spark.sources.delta_dv import (
        deserialize_bitmap, serialize_bitmap)

    want = sorted(set(indices))
    got = deserialize_bitmap(serialize_bitmap(indices)).tolist()
    assert got == want


@given(st.integers(min_value=0, max_value=1 << 16),
       st.integers(min_value=1, max_value=6000))
@settings(max_examples=20, deadline=None)
def test_roaring_bitmap_dense_run(start, length):
    """Contiguous runs crossing the 4096 array->bitmap container
    boundary round-trip exactly (the container-kind switch is the
    format's sharpest edge)."""
    from sling_cli_spark.sources.delta_dv import (
        deserialize_bitmap, serialize_bitmap)

    vals = list(range(start, start + length))
    got = deserialize_bitmap(serialize_bitmap(vals)).tolist()
    assert got == vals


@given(st.lists(st.integers(min_value=0, max_value=1 << 33),
                max_size=200))
@settings(max_examples=100, deadline=None)
def test_puffin_dv_blob_roundtrip(indices):
    """Iceberg v3 deletion-vector-v1 blob: dv_blob -> dv_blob_indices
    is the identity (magic-prefixed delta-compatible bitmap + CRC)."""
    from sling_cli_spark.sources.puffin import dv_blob, dv_blob_indices

    want = sorted(set(indices))
    got = dv_blob_indices(dv_blob(indices)).tolist()
    assert got == want


@given(st.binary(min_size=4, max_size=64).map(
    lambda b: b[:len(b) - len(b) % 4]))
@settings(max_examples=100, deadline=None)
def test_z85_roundtrip(data):
    """ZeroMQ Z85 encode/decode identity on 4-byte-aligned input (the
    DV descriptor's UUID and inline-bitmap carrier)."""
    from sling_cli_spark.sources.delta_dv import z85_decode, z85_encode

    if not data:
        return
    assert z85_decode(z85_encode(data)) == data


# --- iceberg transform twins (r9) -----------------------------------

@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_murmur3_long_twin_matches_reference_impl(v):
    """The Python scalar murmur3 (pruning twin) over the 8-byte LE
    layout must agree with an independent pure re-derivation for any
    long — protects the transform_literal side of bucket pruning."""
    import struct

    from sling_cli_spark.sources.iceberg_transforms import (
        _hash_long, murmur3_32)

    assert _hash_long(v) == murmur3_32(struct.pack("<q", v))
    assert -(2**31) <= _hash_long(v) < 2**31


@given(st.integers(min_value=-10**12, max_value=10**12),
       st.integers(min_value=1, max_value=10**6))
def test_truncate_literal_is_floor_multiple(v, w):
    from sling_cli_spark.sources.iceberg_transforms import (
        transform_literal)

    t = transform_literal(f"truncate[{w}]", v, "long")
    assert t % w == 0 and t <= v < t + w


@given(st.dates(), st.integers(min_value=1, max_value=4096))
def test_bucket_literal_in_range(d, n):
    from sling_cli_spark.sources.iceberg_transforms import (
        transform_literal)

    b = transform_literal(f"bucket[{n}]", d, "date")
    assert 0 <= b < n


@given(st.dates())
def test_temporal_transforms_are_monotone_consistent(d):
    """year/month/day of the same date must be mutually consistent
    (the interval-disproof kernel relies on this monotonicity)."""
    import datetime

    from sling_cli_spark.sources.iceberg_transforms import (
        transform_literal)

    y = transform_literal("year", d, "date")
    m = transform_literal("month", d, "date")
    dd = transform_literal("day", d, "date")
    assert y == d.year - 1970
    assert m == (d.year - 1970) * 12 + d.month - 1
    assert datetime.date(1970, 1, 1) + datetime.timedelta(days=dd) == d


# --- r11 ported helpers: property coverage -------------------------------

_decimal_str = st.from_regex(r"-?[0-9]{1,12}(\.[0-9]{1,12})?",
                             fullmatch=True)


@given(_decimal_str, st.integers(min_value=-2, max_value=15))
def test_truncate_decimal_is_value_preserving_prefix(num, dec):
    from sling_cli_spark.operators.inference import (
        truncate_decimal_string)

    out = truncate_decimal_string(num, dec)
    assert num.startswith(out)
    # decimal places in the result never exceed the requested count
    if "." in out and dec >= 0:
        assert len(out.split(".", 1)[1]) <= dec


@given(_decimal_str)
def test_count_digits_consistency(num):
    from sling_cli_spark.operators.inference import count_digits

    precision, scale = count_digits(num)
    assert precision == len(num.replace(".", "").replace("-", "")) \
        + num.count("-")  # '-' counts as a char in the Go port
    assert 0 <= scale <= precision


@given(st.text(min_size=0, max_size=40))
def test_clean_name_shape_and_idempotence(name):
    from sling_cli_spark.operators.select import clean_name

    out = clean_name(name)
    assert re.fullmatch(r"[_0-9A-Za-z]*", out) is not None
    assert not re.match(r"^\d", out)          # never digit-led
    assert clean_name(out) == out             # idempotent


@given(st.text(min_size=0, max_size=60))
def test_decode_json_if_base64_total_and_idempotent(s):
    import json as _json

    from sling_cli_spark.config import decode_json_if_base64 as dec

    out = dec(s)   # never raises, whatever arrives
    if out != s:   # a rewrite only ever produces valid JSON
        _json.loads(out)
    assert dec(out) == out  # idempotent


@given(st.integers(min_value=0, max_value=50),
       st.integers(min_value=0, max_value=30),
       st.booleans(),
       st.integers(min_value=0, max_value=20),
       st.integers(min_value=0, max_value=10))
def test_decimal_apply_column_respects_bounds(p, s, sourced, max_len,
                                              max_dec_len):
    from sling_cli_spark.operators.typing_policy import DecimalTyping

    dct = DecimalTyping(max_precision=20, max_scale=8)
    precision, scale = dct.apply_column(
        db_precision=p, db_scale=s, sourced=sourced,
        max_len=max_len, max_dec_len=max_dec_len)
    # explicit maxima always bind (the stats floor yields to them)
    assert precision <= max(20, max_len)
    assert scale <= 8
    assert precision >= 1 or (p == 0 and max_len == 0)
