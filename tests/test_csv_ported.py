"""csv_test.go vectors, ported (reference: core/dbio/iop/csv_test.go).

- TestCleanHeaderRow (:89)   -> operators.select.clean_header_row
- TestDetectDelimiter (:206) -> sources.files.detect_delimiter
- TestISO8601 (:138)         -> partitions.iso8601_to_spark_layout
  (expected values are the SPARK DateTimeFormatter twins of the Go
  layouts the reference produces — same tokens, Spark pattern alphabet)
- TestSreamOptions (:162)    -> behavioral port over an inline CSV
  (the reference reads its repo-local test1.csv; the semantics —
  empty_field_as_null, null_if, datetime_format ISO tokens — are
  asserted on equivalent inline data)
"""

from __future__ import annotations

import pytest

from sling_cli_spark.operators.select import clean_header_row
from sling_cli_spark.partitions import iso8601_to_spark_layout
from sling_cli_spark.sources.files import detect_delimiter


# -------------------------------------------------------- CleanHeaderRow

def test_clean_header_row_ported():
    header = [
        "great-one!9",
        "great-one!9",
        "great-one!9",
        "gag|hello",
        "Seller(s)",
        "1Seller(s) \n cool",
    ]
    out = clean_header_row(header)
    assert out[2] == "great_one_92"
    assert out[5] == "_1seller_s____cool"
    # the full row, pinned beyond the reference's two spot-checks
    assert out == ["great_one_9", "great_one_91", "great_one_92",
                   "gag_hello", "seller_s", "_1seller_s____cool"]


def test_clean_header_row_accents_empty_and_digits():
    assert clean_header_row(["café", "", "9to5", '"quoted"']) == \
        ["cafe", "col", "_9to5", "quoted"]


# ------------------------------------------------------- DetectDelimiter

COMMA_SAMPLE = 'col1,col2\ncal,cal\ncao;daf\n"fa",da\nra<d|da'
PIPE_SAMPLE = 'col1|col2\ncal|cal\ncao|daf\n"fa"|da\nra<d|da'
SEMI_SAMPLE = (
    "Obj;PropId;Value;TimeStamp;TimeStampISO\n"
    "BB01;85;45,3828582763672;133245162327228051;2023-03-28T22:30:32Z\n"
    "BB01;85;40,3816032409668;133245181140278467;2023-03-28T23:01:54Z\n"
    "BB01;85;45,3858795166016;133245207233952957;2023-03-28T23:45:23Z\n"
    "BB01;85;50,388298034668;133245209487304477;2023-03-28T23:49:08Z\n"
    "BB01;85;45,3873443603516;133245215378614197;2023-03-28T23:58:57Z\n"
    "BB01;85;40,3829345703125;133245217529463186;2023-03-29T00:02:32Z\n"
    "BB01;85;35,3816719055176;133245220376169720;2023-03-29T00:07:17Z\n"
    "BB01;85;40,3844985961914;133245230678878369;2023-03-29T00:24:27Z\n"
    "BB01;85;45,3865814208984;133245234406821951;2023-03-29T00:30:40Z")


def test_detect_delimiter_specified_comma():
    deli, num_cols = detect_delimiter(",", COMMA_SAMPLE)
    assert deli == "," and num_cols == 2


def test_detect_delimiter_wrong_suggestion_overridden():
    # the reference returns ',' even when '\t' was configured
    deli, _ = detect_delimiter("\t", COMMA_SAMPLE)
    assert deli == ","


def test_detect_delimiter_unspecified_comma():
    deli, num_cols = detect_delimiter("", COMMA_SAMPLE)
    assert deli == "," and num_cols == 2


def test_detect_delimiter_pipe():
    deli, num_cols = detect_delimiter("", PIPE_SAMPLE)
    assert deli == "|" and num_cols == 2


def test_detect_delimiter_semicolon():
    deli, num_cols = detect_delimiter("", SEMI_SAMPLE)
    assert deli == ";" and num_cols == 5


def test_detect_delimiter_undetectable_raises():
    with pytest.raises(ValueError, match="could not detect"):
        detect_delimiter("", "one\ntwo\nthree\nfour")


# ------------------------------------------------------------- ISO8601

@pytest.mark.parametrize("iso,spark_pattern", [
    ("YYYY-MM-DDTHH:mm:ss.sZ", "yyyy-MM-dd'T'HH:mm:ss.SSSXX"),
    ("YYYY-MM", "yyyy-MM"),
    ("YYYY-MM-DDTHH:mm:ss.sZ09:00", "yyyy-MM-dd'T'HH:mm:ss.SSSXX"),
    ("YYYY-MM-DDTHH:mm:ss.s Z09:00", "yyyy-MM-dd'T'HH:mm:ss.SSS XX"),
    ("YYYY-MM-DDTHH:mm:ss.s -04:00", "yyyy-MM-dd'T'HH:mm:ss.SSS xx"),
    ("YYYY-MM-DDTHH:mm:ss.s+14:00", "yyyy-MM-dd'T'HH:mm:ss.SSSxx"),
    ("DD-MM-YYYY HH:mm:ss.s", "dd-MM-yyyy HH:mm:ss.SSS"),
])
def test_iso8601_to_spark_layout(iso, spark_pattern):
    assert iso8601_to_spark_layout(iso) == spark_pattern


def test_iso8601_date_map_path_render():
    # csv_test.go:158: unix 1494505756 -> /path/2017/05/11/12:29:16
    import datetime

    from sling_cli_spark.partitions import get_iso8601_date_map

    t = datetime.datetime.utcfromtimestamp(1494505756)
    m = get_iso8601_date_map(t)
    s = "/path/{YYYY}/{MM}/{DD}/{HH}:{mm}:{ss}"
    for k, v in m.items():
        s = s.replace("{%s}" % k, v)
    assert s == "/path/2017/05/11/12:29:16"


# ---------------------------------------------------- stream options

STREAM_CSV = (
    "id,first_name,last_name,email,rating,create_dt\n"
    "1,Anna,Able,a@x.com,5,19-02-2019 16:23:06.000\n"
    "2,,NULL, killsley9@feedburner.com ,3,19-02-2019 16:23:06.000\n"
    ",Roger,Rabbit,r@x.com,1,20-02-2019 01:02:03.000\n")


def _consume(spark, tmp_path, **opts):
    from sling_cli_spark.config import SourceOptions
    from sling_cli_spark.sources.files import read_files

    p = tmp_path / "t1.csv"
    p.write_text(STREAM_CSV)
    return read_files(spark, str(p), SourceOptions(**opts))


def test_stream_options_empty_field_as_null_false(spark, tmp_path):
    rows = _consume(spark, tmp_path,
                    empty_field_as_null=False).collect()
    assert rows[1]["first_name"] == ""      # kept as empty string
    assert rows[1]["last_name"] == "NULL"   # literal until null_if
    assert rows[2]["id"] == ""              # untyped read keeps ""


def test_stream_options_empty_field_as_null_true(spark, tmp_path):
    rows = _consume(spark, tmp_path).collect()
    assert rows[1]["first_name"] is None
    assert rows[1]["last_name"] == "NULL"
    assert rows[1]["email"] == " killsley9@feedburner.com "
    assert rows[2]["id"] is None


def test_stream_options_null_if_and_datetime_format(spark, tmp_path):
    from sling_cli_spark.operators.inference import infer_and_cast

    df = _consume(spark, tmp_path, null_if="NULL",
                  datetime_format="DD-MM-YYYY HH:mm:ss.s")
    rows = df.collect()
    assert rows[1]["last_name"] is None     # null_if applied
    # without the configured layout, dd-MM-yyyy is not a recognized
    # builtin -> string (csv_test.go: "since timestamp is not recognized")
    plain = dict(infer_and_cast(df).dtypes)
    assert plain["create_dt"] == "string"
    typed = infer_and_cast(df, datetime_format="DD-MM-YYYY HH:mm:ss.s")
    kinds = dict(typed.dtypes)
    assert kinds["create_dt"].startswith("timestamp")
    got = [r["create_dt"] for r in typed.collect()]
    import datetime as _dt
    assert got[0] == _dt.datetime(2019, 2, 19, 16, 23, 6)
