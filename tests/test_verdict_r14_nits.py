"""Pinned regression tests for the three VERDICT r13 "What's wrong"
nits (all cosmetic-grade, none previously wrong-answer):

1. ``_chunk_bounds`` computed numeric chunk edges in float space —
   a BIGINT update_key above 2^53 got imprecise range bounds (chunk
   sizing drifted; coverage held only via the </>= pairing). Now
   integral lo/hi produce exact integer edges.
2. ``db_source_is_empty`` mapped a probe *error* to "non-empty"
   silently — now the swallowed exception is logged at WARNING.
3. The replication harness's backtick→double-quote rewrite touched
   backticks inside SQL string literals — now masked.
"""

import logging

import pytest


# ---------------------------------------------------------------------------
# nit 1: integer chunk edges


def test_chunk_bounds_bigint_above_2p53_chunk_size():
    from sling_cli_spark.sinks.db_load import _chunk_bounds

    lo = 2**53 + 1          # not representable exactly as float +1
    hi = 2**53 + 1000
    ranges = _chunk_bounds(lo, hi, chunk_size="100")
    # edges are exact ints, not floats
    assert all(isinstance(a, int) and isinstance(b, int)
               for a, b in ranges)
    assert ranges[0][0] == lo and ranges[-1][1] == hi
    # contiguous half-open cover: each edge meets the next exactly
    for (a, b), (c, _) in zip(ranges, ranges[1:]):
        assert b == c
    # every chunk except the last spans exactly 100
    assert all(b - a == 100 for a, b in ranges[:-1])


def test_chunk_bounds_bigint_above_2p53_chunk_count():
    from sling_cli_spark.sinks.db_load import _chunk_bounds

    lo = 2**60
    hi = 2**60 + 10**7 + 3
    ranges = _chunk_bounds(lo, hi, chunk_count=7)
    assert len(ranges) == 7
    assert all(isinstance(a, int) and isinstance(b, int)
               for a, b in ranges)
    assert ranges[0][0] == lo and ranges[-1][1] == hi
    for (a, b), (c, _) in zip(ranges, ranges[1:]):
        assert b == c
    # even split within 1 of each other
    widths = {b - a for a, b in ranges}
    assert max(widths) - min(widths) <= 1


def test_chunk_bounds_float_keys_still_float():
    from sling_cli_spark.sinks.db_load import _chunk_bounds

    ranges = _chunk_bounds(0.5, 10.5, chunk_size="2.5")
    assert ranges[0][0] == 0.5 and ranges[-1][1] == 10.5
    assert len(ranges) == 4


def test_chunk_bounds_fractional_width_on_ints_falls_back():
    from sling_cli_spark.sinks.db_load import _chunk_bounds

    # a fractional chunk_size over integer keys keeps the float path
    ranges = _chunk_bounds(0, 10, chunk_size="2.5")
    assert ranges[0][0] == 0 and ranges[-1][1] == 10.0
    assert len(ranges) == 4


# ---------------------------------------------------------------------------
# nit 2: probe error is logged


def test_empty_probe_error_logged(tmp_path, caplog):
    from sling_cli_spark.config import Source
    from sling_cli_spark.sinks.db_load import (
        DuckDBTarget, db_source_is_empty)

    db = DuckDBTarget(str(tmp_path / "probe.duckdb"))
    try:
        src = Source(conn="duckdb://" + str(tmp_path / "probe.duckdb"),
                     stream="no_such_table_xyz")
        with caplog.at_level(logging.WARNING,
                             logger="sling_cli_spark.sinks.db_load"):
            assert db_source_is_empty(None, src, db=db) is False
        assert any("probe failed" in r.message for r in caplog.records), \
            "swallowed probe exception must be logged at WARNING"
    finally:
        db.close()


# ---------------------------------------------------------------------------
# nit 3: masked backtick rewrite


def test_backtick_rewrite_masks_string_literals():
    from tests.replication_harness import adapt_sql

    sql = "select `col a`, 'a `literal` backtick' from `tbl`"
    out = adapt_sql(sql)
    assert '"col a"' in out and '"tbl"' in out
    assert "'a `literal` backtick'" in out, \
        "backticks inside string literals must survive the rewrite"


def test_backtick_rewrite_handles_escaped_quotes():
    from tests.replication_harness import adapt_sql

    sql = "insert into `t` values ('it''s a `q`')"
    out = adapt_sql(sql)
    assert '"t"' in out
    assert "'it''s a `q`'" in out


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
