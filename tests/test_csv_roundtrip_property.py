"""CSV writer/reader roundtrip invariants (r12 — the writer moved to
RFC-4180 quote doubling and the reader grew sample-driven multiLine/
delimiter sniffs; these pin the contract).

- a nasty deterministic corpus (embedded quotes, newlines, delimiters
  in values, unicode, nulls) roundtrips byte-identically through
  write_files(csv) -> read_files(csv) with NO options configured
  (both sniffs must fire)
- pure-Python properties for the two sniffs over generated samples
"""

import csv as _csv
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from sling_cli_spark.config import Mode, SourceOptions, Target, TargetOptions
from sling_cli_spark.sources.files import (
    detect_delimiter,
    sample_has_quoted_newlines,
)

NASTY = [
    ("plain", "value"),
    ("comma, inside", "and, another"),
    ('quote " inside', 'double "" inside'),
    ("newline\ninside", "two\nnew\nlines"),
    ('mix,"\nall', '"\n,"'),
    ("unicode Ångström 北京 🚀", "Ωmega"),
    ("semicolon; pipe|tab\t", "empty-next"),
    (None, "left-null"),
    ("right-null", None),
]


def test_nasty_corpus_roundtrips_with_no_options(spark, tmp_path):
    from sling_cli_spark.sinks.writers import write_files
    from sling_cli_spark.sources.files import read_files

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(NASTY)],
        "id int, a string, b string")
    out = str(tmp_path / "rt.csv")
    write_files(df, Target(object=out, options=TargetOptions(
        format="csv", single=True)), Mode.FULL_REFRESH)
    back = read_files(spark, out, SourceOptions(format="csv"))
    got = {int(r["id"]): (r["a"], r["b"]) for r in back.collect()}
    assert len(got) == len(NASTY)
    for i, (a, b) in enumerate(NASTY):
        # default semantic: an empty CSV field IS null (stream_processor
        # empty_field_as_null) — None roundtrips to None
        assert got[i] == (a, b), f"row {i}: {got[i]!r} != {(a, b)!r}"


@given(st.lists(
    st.lists(st.text(
        alphabet=st.characters(blacklist_characters='\r',
                               blacklist_categories=("Cs",)),
        min_size=0, max_size=12), min_size=2, max_size=5),
    min_size=2, max_size=8))
@settings(max_examples=60, deadline=None)
def test_quoted_newline_sniff_matches_csv_module(rows):
    """The multiLine sniff fires iff the RFC-4180 encoding of the rows
    actually contains a quoted embedded newline."""
    ncols = min(len(r) for r in rows)
    rows = [r[:ncols] for r in rows]
    buf = io.StringIO()
    _csv.writer(buf, lineterminator="\n").writerows(rows)
    sample = buf.getvalue() + "trailing,partial"  # truncated last line
    has_embedded = any("\n" in cell for row in rows for cell in row)
    assert sample_has_quoted_newlines(sample) == has_embedded


@given(st.sampled_from([",", ";", "|", "\t"]),
       st.lists(st.lists(st.text(alphabet="abcdef xyz", min_size=1,
                                 max_size=8),
                         min_size=3, max_size=6),
                min_size=3, max_size=8))
@settings(max_examples=60, deadline=None)
def test_delimiter_detection_on_clean_samples(delim, rows):
    """For alphanumeric cells, the sniff recovers the writing delimiter
    (>=3 columns so the true delimiter always wins the column vote)."""
    ncols = min(len(r) for r in rows)
    rows = [r[:ncols] for r in rows]
    buf = io.StringIO()
    _csv.writer(buf, delimiter=delim, lineterminator="\n").writerows(rows)
    got, cols = detect_delimiter(None, buf.getvalue() + "\n")
    assert got == delim
    assert cols == ncols
