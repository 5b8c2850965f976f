"""transforms_test.go transform-function vectors, ported 1:1.

Source tables (reference: ``core/dbio/iop/transforms_test.go``):

- TestNonPrintable   (:13)  — behavior pinned from the Go implementation
  (transforms.go ReplaceNonPrintable), the Go test only prints
- TestFIX            (:24)  — ParseFIXMap field-name assertions
- TestTransformMsUUID (:66) — mixed-endian GUID bytes -> canonical text
- TestBinaryToDecimal (:73) — MySQL BIT -> decimal, text passthrough
- TestBinaryToHex    (:143) — uppercase hex, empty passthrough

Port adaptations (deliberate, marked at the case):

- FIX message 5 is the SOH-delimiter-stripped form; with the separators
  gone the text is ambiguous ("8=FIX.4.09=128" could split as tag 9 or
  "09"), and the reference's own char-split fallback yields no pairs for
  it either — the port asserts our parser degrades without error.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from sling_cli_spark.operators.transforms import apply_transforms


def _one(spark, value, transform):
    df = spark.createDataFrame([Row(c=value)])
    return apply_transforms(df, {"c": [transform]}).collect()[0]["c"]


# ------------------------------------------------------- TestNonPrintable

NONPRINTABLE_CASES = [
    ("nul_removed", "a\x00b", "ab"),
    ("soh_to_space", "a\x01b", "a b"),
    ("ctrl_1_to_8_to_space", "x\x02\x03\x08y", "x   y"),
    ("tab_kept", "a\tb", "a\tb"),
    ("newline_kept", "a\nb", "a\nb"),
    ("vt_ff_cr_kept", "a\x0b\x0c\rb", "a\x0b\x0c\rb"),
    ("ctrl_14_to_31_to_space", "a\x0e\x1fb", "a  b"),
    ("space_kept", "a b", "a b"),
    ("digit_kept", "1", "1"),
    ("del_removed", "a\x7fb", "ab"),
    ("nbsp_to_space", "a\u00a0b", "a b"),
    ("zero_width_space_removed", "a\u200bb", "ab"),
    ("zwj_zwnj_removed", "a\u200c\u200db", "ab"),
    ("word_joiner_removed", "a\u2060b", "ab"),
    ("bom_removed", "a\ufeffb", "ab"),
    ("directional_marks_removed", "a\u200e\u200f\u202a\u202eb", "ab"),
    ("soft_hyphen_removed", "a\u00adb", "ab"),
    ("replacement_chars_removed", "a\ufffc\ufffdb", "ab"),
    ("graphic_unicode_kept", "héllo 👋", "héllo 👋"),
]


@pytest.mark.parametrize("name,inp,expected", NONPRINTABLE_CASES,
                         ids=[c[0] for c in NONPRINTABLE_CASES])
def test_replace_non_printable_ported(spark, name, inp, expected):
    assert _one(spark, inp, "replace_non_printable") == expected


# ----------------------------------------------------------------- TestFIX

FIX_MESSAGES = [
    # transforms_test.go:25-30, verbatim
    "8=FIX.4.2|9=332|35=8|49=XXX|56=SYS1|34=190|52=20181106-08:00:23|"
    "128=802c88|1=802c88_ISA|6=1.2557|11=7314956|14=12|15=GBP|"
    "17=EAVVA18KA1117184|20=0|22=4|30=XLON|31=1.2557|32=12|"
    "37=OAVVA18KA8302522|38=12|39=2|40=1|48=JE00B6173J15|54=2|55=GCP|"
    "59=1|60=20181106-08:00:21|63=6|64=20181108|76=CSTEGB21|110=0|"
    "119=15.0684|120=GBP|150=2|151=0|167=CS|207=XLON|10=105|",
    "8=FIX.4.2|9=393|35=8|49=XXX|56=SYS1|34=191|52=20181106-08:00:33|"
    "128=802c11|1=569_C11_TPAB|6=0.2366|11=16669868|14=6061|15=GBP|"
    "17=EBSTI18KA1117185|20=0|21=2|22=4|30=XOFF|31=0.2366|32=6061|"
    "37=OBSTI18KA8302657|38=6061|39=2|40=2|44=0.2366|48=GB00B0DG3H29|"
    "54=1|55=SXX|59=6|60=20181106-08:00:31|63=3|64=20181108|"
    "76=WNTSGB2LBIC|110=0|119=1434.03|120=GBP|126=20181106-23:00:00|"
    "150=2|151=0|152=1434.03|167=CS|207=XLON|10=178|",
    "8=FIX.4.2|9=65|35=A|49=SERVER|56=CLIENT|34=177|52=20090107-18:15:16|"
    "98=0|108=30|10=062|",
    "8=FIX.4.2 | 9=178 | 35=8 | 49=PHLX | 56=PERS | "
    "52=20071123-05:30:00.000 | 11=ATOMNOCCC9990900 | 20=3 | 150=E | "
    "39=E | 55=MSFT | 167=CS | 54=1 | 38=15 | 40=2 | 44=15 | "
    "58=PHLX EQUITY TESTING | 59=0 | 47=C | 32=0 | 31=0 | 151=15 | "
    "14=0 | 6=0 | 10=128 |",
]


def test_fix_messages_ported(spark):
    df = spark.createDataFrame([Row(c=m) for m in FIX_MESSAGES])
    out = [json.loads(r["c"])
           for r in apply_transforms(df, {"c": ["parse_fix"]}).collect()]
    # transforms_test.go:38-51 assertions, per message index
    assert "account" in out[0] and "avg_px" in out[0]
    assert "account" in out[1] and "settl_curr_amt" in out[1]
    assert "begin_string" in out[3] and "sending_time" in out[3]
    # spot-check parsed values too (stronger than the Go Contains)
    assert out[0]["account"] == "802c88_ISA"
    assert out[1]["settl_curr_amt"] == "1434.03"
    assert out[2]["begin_string"] == "FIX.4.2"
    assert out[3]["sending_time"] == "20071123-05:30:00.000"
    assert out[3]["text"] == "PHLX EQUITY TESTING"


def test_fix_contiguous_message_degrades_without_error(spark):
    # transforms_test.go:29 message 5: the SOH separators are stripped in
    # the Go source, making the text ambiguous ("8=FIX.4.09=128" — tag 9
    # or "09"?). DELIBERATE DIVERGENCE: the reference's char-split
    # fallback produces no pairs for it either; we assert no-crash and a
    # JSON object out.
    m = ("8=FIX.4.09=12835=D34=249=TW52=20060102-15:04:0556=ISLD115=1"
         "16=CS128=MG129=CB11=ID21=338=10040=w54=155=INTC"
         "60=20060102-15:04:0510=123")
    out = _one(spark, m, "parse_fix")
    assert isinstance(json.loads(out), dict)


# ------------------------------------------------- TestTransformMsUUID

def test_parse_ms_uuid_ported(spark):
    raw = bytes([0x78, 0x56, 0x34, 0x12, 0x34, 0x12, 0x34, 0x12,
                 0x12, 0x34, 0x12, 0x34, 0x56, 0x78, 0x9A, 0xBC])
    df = spark.createDataFrame([Row(c=bytearray(raw))])
    got = apply_transforms(df, {"c": ["parse_ms_uuid"]}).collect()[0]["c"]
    assert got == "12345678-1234-1234-1234-123456789abc"


# ------------------------------------------------- TestBinaryToDecimal

B2D_CASES = [
    ("bit1_zero", b"\x00", "0"),
    ("bit1_one", b"\x01", "1"),
    ("bit8_255", b"\xff", "255"),
    ("bit16_65535", b"\xff\xff", "65535"),
    ("bit24_16777215", b"\xff\xff\xff", "16777215"),
    ("bit32_4294967295", b"\xff\xff\xff\xff", "4294967295"),
    ("bit64_max", b"\xff" * 8, "18446744073709551615"),
    ("bit8_10101010", b"\xaa", "170"),
    ("bit16_pattern", b"\x12\x34", "4660"),
    ("text_passthrough", b"hello", "hello"),
]


@pytest.mark.parametrize("name,inp,expected", B2D_CASES,
                         ids=[c[0] for c in B2D_CASES])
def test_binary_to_decimal_ported(spark, name, inp, expected):
    assert _one(spark, bytearray(inp), "binary_to_decimal") == expected


# ----------------------------------------------------- TestBinaryToHex

B2H_CASES = [
    ("empty", b"", ""),
    ("byte_00", b"\x00", "00"),
    ("byte_01", b"\x01", "01"),
    ("byte_ff", b"\xff", "FF"),
    ("two_bytes_1234", b"\x12\x34", "1234"),
    ("deadbeef", b"\xde\xad\xbe\xef", "DEADBEEF"),
    ("text_hello", b"Hello", "48656C6C6F"),
    ("eight_ff", b"\xff" * 8, "FFFFFFFFFFFFFFFF"),
    ("alternating", b"\xaa\x55\xaa\x55", "AA55AA55"),
]


@pytest.mark.parametrize("name,inp,expected", B2H_CASES,
                         ids=[c[0] for c in B2H_CASES])
def test_binary_to_hex_ported(spark, name, inp, expected):
    assert _one(spark, bytearray(inp), "binary_to_hex") == expected
