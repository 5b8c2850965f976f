"""Named transform registry (reference: core/dbio/iop/transforms.go:166-422)."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sling_cli_spark.operators.transforms import (
    apply_transforms, transform_column)


def _one(spark, value, *transforms):
    df = spark.createDataFrame([Row(c=value)])
    out = apply_transforms(df, {"c": list(transforms)})
    return out.collect()[0]["c"]


def test_lower_trim(spark):
    assert _one(spark, "  HeLLo ", "lower", "trim_space") == "hello"


def test_hash_md5(spark):
    assert _one(spark, "abc", "hash_md5") == hashlib.md5(b"abc").hexdigest()


def test_hash_sha256(spark):
    assert _one(spark, "abc", "hash_sha256") == \
        hashlib.sha256(b"abc").hexdigest()


def test_empty_as_null(spark):
    assert _one(spark, "", "empty_as_null") is None
    assert _one(spark, "x", "empty_as_null") == "x"


def test_replace_non_printable(spark):
    # reference ReplaceNonPrintable: control chars 1-8/14-31 become a
    # SPACE (not removed) — transforms.go `newVal.WriteRune(' ')`
    assert _one(spark, "a\x01b\x02c", "replace_non_printable") == "a b c"


def test_replace_accents(spark):
    assert _one(spark, "café", "replace_accents") == "cafe"


def test_arg_transform_replace(spark):
    assert _one(spark, "a-b-c", "replace(-,_)") == "a_b_c"


def test_arg_transform_substring(spark):
    assert _one(spark, "abcdef", "substring(1,3)") == "abc"


def test_unknown_transform_raises(spark):
    df = spark.createDataFrame([Row(c="x")])
    with pytest.raises(ValueError):
        apply_transforms(df, {"c": ["no_such_transform"]})


def test_list_form_applies_to_all_strings(spark):
    df = spark.createDataFrame([Row(a=" X ", b=" y ", n=1)])
    out = apply_transforms(df, ["trim_space", "lower"]).collect()[0]
    assert (out["a"], out["b"], out["n"]) == ("x", "y", 1)


def test_parse_bit(spark):
    df = spark.createDataFrame([Row(c=bytearray(b"\x01"))])
    out = df.select(transform_column(F.col("c"), "parse_bit").alias("c"))
    assert out.collect()[0]["c"] == "1"


# --- parse_fix (transforms.go:429-521, 621-628) -------------------------

def test_parse_fix_soh_delimited(spark):
    import json

    msg = "8=FIX.4.2\x0135=D\x0149=SENDER\x0156=TARGET\x0155=IBM\x01" \
          "54=1\x0138=100\x0144=25.5\x0110=003\x01"
    df = spark.createDataFrame([(msg,)], "m string")
    out = df.select(transform_column(F.col("m"), "parse_fix").alias("j")) \
        .collect()[0]["j"]
    d = json.loads(out)
    assert d["begin_string"] == "FIX.4.2"
    assert d["msg_type"] == "D"
    assert d["symbol"] == "IBM"
    assert d["order_qty"] == "100"
    assert d["price"] == "25.5"
    assert d["check_sum"] == "003"


def test_parse_fix_pipe_and_space_delimited(spark):
    import json

    rows = [("8=FIX.4.4|35=8|150=F|151=0|31=10.25|32=50",),
            ("8=FIX.4.1 35=0 34=7 52=20240101-10:00:00",)]
    df = spark.createDataFrame(rows, "m string")
    got = [json.loads(r["j"]) for r in df.select(
        transform_column(F.col("m"), "parse_fix").alias("j")).collect()]
    assert got[0]["exec_type"] == "F" and got[0]["last_px"] == "10.25"
    assert got[1]["msg_seq_num"] == "7"
    assert got[1]["sending_time"] == "20240101-10:00:00"


def test_parse_fix_unknown_tag_keeps_number(spark):
    import json

    df = spark.createDataFrame([("35=D\x019999=custom\x01",)], "m string")
    d = json.loads(df.select(
        transform_column(F.col("m"), "parse_fix").alias("j")).collect()[0]["j"])
    assert d["msg_type"] == "D" and d["9999"] == "custom"


def test_parse_fix_stays_jvm_side(spark):
    df = spark.createDataFrame([("35=D",)], "m string")
    plan = df.select(transform_column(F.col("m"), "parse_fix").alias("j")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PythonRDD" not in plan and "BatchEvalPython" not in plan


# --- encoding re-decode repairs (transforms.go:52-120) ------------------

def test_decode_windows1252_repairs_latin1_misread(spark):
    # bytes of "€ smart “quotes”" in cp1252, misread as latin1
    original = "€ smart “quotes” – café"
    misread = original.encode("windows-1252").decode("latin1")
    df = spark.createDataFrame([(misread,)], "s string")
    got = df.select(transform_column(F.col("s"), "decode_windows1252")
                    .alias("x")).collect()[0]["x"]
    assert got == original


def test_decode_windows1250_repairs_central_european(spark):
    original = "zażółć gęślą"  # Polish
    misread = original.encode("windows-1250").decode("latin1")
    df = spark.createDataFrame([(misread,)], "s string")
    got = df.select(transform_column(F.col("s"), "decode_windows1250")
                    .alias("x")).collect()[0]["x"]
    assert got == original


def test_decode_latin5_turkish(spark):
    original = "ğüneş İSTANBUL"  # Turkish g-breve etc.
    misread = original.encode("iso-8859-9").decode("latin1")
    df = spark.createDataFrame([(misread,)], "s string")
    got = df.select(transform_column(F.col("s"), "decode_latin5")
                    .alias("x")).collect()[0]["x"]
    assert got == original


def test_decode_utf16_from_bytes(spark):
    original = "héllo 世界"
    misread = original.encode("utf-16").decode("latin1")
    df = spark.createDataFrame([(misread,)], "s string")
    got = df.select(transform_column(F.col("s"), "decode_utf16")
                    .alias("x")).collect()[0]["x"]
    assert got == original


def test_encode_decode_roundtrip_single_byte_charsets(spark):
    """encode_* is the byte-exact inverse of the decode_* repair for
    every char the charset defines (TransformEncode* twins)."""
    from sling_cli_spark.operators.transforms import apply_transforms

    samples = [
        ("windows1252", "café € smart “quotes”"),
        ("windows1250", "złoty š ž"),
        ("latin5", "Türkçe ğı"),
        ("latin9", "œuvre €"),
    ]
    for codec, text in samples:
        df = spark.createDataFrame([(text,)], "t string")
        enc = apply_transforms(df, {"t": [f"encode_{codec}"]})
        dec_ready = enc.selectExpr("decode(t, 'ISO-8859-1') as t")
        back = apply_transforms(dec_ready, {"t": [f"decode_{codec}"]})
        assert back.collect()[0]["t"] == text, codec


def test_encode_utf8_bom_and_utf16(spark):
    from sling_cli_spark.operators.transforms import apply_transforms

    df = spark.createDataFrame([("hi",)], "t string")
    bom = apply_transforms(df, {"t": ["encode_utf8_bom"]}).collect()[0]["t"]
    assert bytes(bom).startswith(b"\xef\xbb\xbf") and bytes(bom)[3:] == b"hi"
    u16 = apply_transforms(df, {"t": ["encode_utf16"]}).collect()[0]["t"]
    assert bytes(u16).decode("utf-16") == "hi"
