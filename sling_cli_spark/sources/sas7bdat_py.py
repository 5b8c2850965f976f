"""Minimal SAS7BDAT writer (stdlib) — fixture/export support.

The reference reads sas7bdat natively (``core/dbio/iop/sas7bdat.go``);
this engine reads it through ``pandas.read_sas`` (sources/files.py).
SAS itself is the only mainstream producer of the format, so testing
the read path needs a generator: this module writes the uncompressed
32-bit little-endian subset of the PUBLICLY documented layout
(the community format spec, also implemented by parso/readstat/pandas —
see pandas ``io/sas/sas_constants.py`` for the field tables):

- 1024-byte header: magic, alignment/endianness flags, encoding,
  dataset name, timestamps (epoch 1960-01-01), header/page sizes
- one META page: row_size (F7F7F7F7), column_size (F6F6F6F6),
  column_text (FDFFFFFF), column_name (FFFFFFFF), column_attributes
  (FCFFFFFF) and one format subheader (FEFBFFFF) per column, addressed
  by a 12-byte pointer table
- DATA pages (type 0x100): rows packed after the 8-byte page header,
  doubles as IEEE-754 LE, strings space-padded fixed-width

Numbers are SAS doubles; strings are fixed width (max observed length).
Enough for round-trip tests and small exports — not a general SAS
writer (no compression, no dates-as-formats, single text heap).
"""

from __future__ import annotations

import struct
import time
from typing import Any, Sequence

_MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00"
    b"\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
    b"\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)
_HEADER_LEN = 1024
_BIT_OFFSET = 16          # x86 page header offset
_PTR_LEN = 12             # x86 subheader pointer size
_EPOCH_1960 = -315619200  # unix epoch of 1960-01-01


def _pad(b: bytes, n: int, fill: bytes = b"\x00") -> bytes:
    return b[:n] + fill * (n - len(b))


def infer_columns(
    names: Sequence[str], rows: Sequence[Sequence[Any]],
) -> list[tuple[str, str, int]]:
    """-> [(name, 'd'|'s', byte_width)] — numerics are 8-byte doubles,
    strings sized to the longest utf-8 value (min 1)."""
    cols: list[tuple[str, str, int]] = []
    for j, name in enumerate(names):
        vals = [r[j] for r in rows if r[j] is not None]
        if vals and all(isinstance(v, (int, float, bool)) for v in vals):
            cols.append((name, "d", 8))
        else:
            width = max([len(str(v).encode()) for v in vals] or [1])
            cols.append((name, "s", max(1, width)))
    return cols


def write_sas7bdat(
    path: str,
    names: Sequence[str],
    rows: Sequence[Sequence[Any]],
    dataset: str = "DATA",
    page_size: int = 0x10000,
) -> None:
    cols = infer_columns(names, rows)
    # row layout: doubles first (8-aligned), strings after
    final_offsets = [0] * len(cols)
    off = 0
    for j, (_, kind, _w) in enumerate(cols):
        if kind == "d":
            final_offsets[j] = off
            off += 8
    for j, (_, kind, width) in enumerate(cols):
        if kind == "s":
            final_offsets[j] = off
            off += width
    row_length = off

    rows_per_page = max(1, (page_size - _BIT_OFFSET - 8) // max(1, row_length))
    n_data_pages = (len(rows) + rows_per_page - 1) // rows_per_page or 1

    # ---------------------------------------------------------- header
    now = float(int(time.time()) - _EPOCH_1960)
    head = bytearray(_HEADER_LEN)
    head[0:32] = _MAGIC
    head[32] = 0x22          # not '3' => 32-bit layout
    head[35] = 0x22          # not '3' => align1 = 0
    head[37] = 0x01          # little-endian
    head[39] = ord("1")      # unix platform
    head[70] = 20            # utf-8
    head[92:156] = _pad(dataset.encode(), 64, b" ")
    head[156:164] = b"DATA    "
    struct.pack_into("<d", head, 164, now)
    struct.pack_into("<d", head, 172, now)
    struct.pack_into("<I", head, 196, _HEADER_LEN)
    struct.pack_into("<I", head, 200, page_size)
    struct.pack_into("<I", head, 204, 1 + n_data_pages)
    head[216:224] = _pad(b"9.0401M2", 8)
    head[224:240] = _pad(b"Linux", 16)

    # ------------------------------------------------------- meta page
    n = len(cols)
    names_enc = [name.encode() for name, _, _ in cols]
    # text heap: read from sig+4 for text_block_size bytes; name offsets
    # are relative to that point. content starts at +4 (u16 size + pad)
    text_payload = b"".join(names_enc)
    text_block_size = 4 + len(text_payload)
    name_offsets: list[int] = []
    pos = 4
    for nm in names_enc:
        name_offsets.append(pos)
        pos += len(nm)

    def sub_row_size() -> bytes:
        b = bytearray(480)
        b[0:4] = b"\xF7\xF7\xF7\xF7"
        struct.pack_into("<I", b, 20, row_length)         # 5 * int_len
        struct.pack_into("<I", b, 24, len(rows))          # 6 * int_len
        struct.pack_into("<I", b, 36, n)                  # col_count_p1
        struct.pack_into("<I", b, 40, 0)                  # col_count_p2
        struct.pack_into("<I", b, 60, rows_per_page)      # mix row count
        struct.pack_into("<H", b, 354, 0)                 # lcs
        struct.pack_into("<H", b, 378, 0)                 # lcp
        return bytes(b)

    def sub_col_size() -> bytes:
        return b"\xF6\xF6\xF6\xF6" + struct.pack("<I", n) + b"\x00" * 4

    def sub_col_text() -> bytes:
        b = bytearray(4 + text_block_size)
        b[0:4] = b"\xFD\xFF\xFF\xFF"
        struct.pack_into("<H", b, 4, text_block_size)
        b[8:8 + len(text_payload)] = text_payload
        return bytes(b)

    def sub_col_names() -> bytes:
        length = 8 * n + 20
        b = bytearray(length)
        b[0:4] = b"\xFF\xFF\xFF\xFF"
        for i in range(n):
            base = 4 + 8 * (i + 1)
            struct.pack_into("<H", b, base + 0, 0)                  # heap idx
            struct.pack_into("<H", b, base + 2, name_offsets[i])
            struct.pack_into("<H", b, base + 4, len(names_enc[i]))
        return bytes(b)

    def sub_col_attrs() -> bytes:
        length = 12 * n + 20
        b = bytearray(length)
        b[0:4] = b"\xFC\xFF\xFF\xFF"
        for i in range(n):
            struct.pack_into("<I", b, 12 + 12 * i, final_offsets[i])
            struct.pack_into("<I", b, 16 + 12 * i, cols[i][2])
            b[22 + 12 * i] = 1 if cols[i][1] == "d" else 2
        return bytes(b)

    def sub_format() -> bytes:
        b = bytearray(52)
        b[0:4] = b"\xFE\xFB\xFF\xFF"
        return bytes(b)  # empty format/label text

    subs = [sub_row_size(), sub_col_size(), sub_col_text(),
            sub_col_names(), sub_col_attrs()] + [sub_format()] * n

    page = bytearray(page_size)
    struct.pack_into("<H", page, _BIT_OFFSET + 0, 0x0000)   # meta page
    struct.pack_into("<H", page, _BIT_OFFSET + 2, len(subs))
    struct.pack_into("<H", page, _BIT_OFFSET + 4, len(subs))
    ptr_base = _BIT_OFFSET + 8
    content = ptr_base + _PTR_LEN * len(subs)
    content += (-content) % 8
    for i, sub in enumerate(subs):
        struct.pack_into("<I", page, ptr_base + _PTR_LEN * i, content)
        struct.pack_into("<I", page, ptr_base + _PTR_LEN * i + 4, len(sub))
        page[ptr_base + _PTR_LEN * i + 8] = 0   # no compression
        page[ptr_base + _PTR_LEN * i + 9] = 0
        page[content:content + len(sub)] = sub
        content += len(sub) + ((-len(sub)) % 8)
        if content > page_size:
            raise ValueError("sas7bdat writer: metadata exceeds page size")
    meta_page = bytes(page)

    # ------------------------------------------------------ data pages
    def encode_row(r: Sequence[Any]) -> bytes:
        b = bytearray(row_length)
        for j, (_, kind, width) in enumerate(cols):
            v = r[j]
            o = final_offsets[j]
            if kind == "d":
                struct.pack_into(
                    "<d", b, o, float("nan") if v is None else float(v))
            else:
                enc = b"" if v is None else str(v).encode()
                b[o:o + width] = _pad(enc, width, b" ")
        return bytes(b)

    data_pages: list[bytes] = []
    for p in range(n_data_pages):
        chunk = rows[p * rows_per_page:(p + 1) * rows_per_page]
        page = bytearray(page_size)
        struct.pack_into("<H", page, _BIT_OFFSET + 0, 0x0100)  # data page
        struct.pack_into("<H", page, _BIT_OFFSET + 2, len(chunk))
        struct.pack_into("<H", page, _BIT_OFFSET + 4, 0)
        pos0 = _BIT_OFFSET + 8
        for i, r in enumerate(chunk):
            page[pos0 + i * row_length:pos0 + (i + 1) * row_length] = \
                encode_row(r)
        data_pages.append(bytes(page))

    from sling_cli_spark import fsio

    fsio.get_fs(path).write_bytes(
        path, bytes(head) + meta_page + b"".join(data_pages))


def write_sas7bdat_df(df, path: str) -> None:
    """DataFrame -> sas7bdat (driver-side, capped like other fallbacks)."""
    from sling_cli_spark.limits import collect_capped

    rows = [tuple(r) for r in collect_capped(
        df, "sas7bdat write (sources/sas7bdat_py)", "parquet/csv output")]
    write_sas7bdat(path, df.columns, rows)
