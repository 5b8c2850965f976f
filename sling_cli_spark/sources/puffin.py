"""Puffin file format + Iceberg v3 deletion-vector blobs.

Public specs: the Puffin format (iceberg.apache.org/puffin-spec) and the
Iceberg table spec v3 §Deletion Vectors (iceberg.apache.org/spec) — v3
replaces position delete FILES with deletion vectors stored as Puffin
blobs of type ``deletion-vector-v1``, whose bitmap payload is the SAME
64-bit "portable" RoaringBitmapArray serialization Delta Lake uses
(spec: "Delta, which has a conforming representation"), so the codec in
:mod:`.delta_dv` is reused verbatim. Reference capability parity:
``/root/reference/core/dbio/iop/iceberg.go`` scans Iceberg via DuckDB's
extension; here the format is parsed directly.

Puffin layout (puffin-spec):

- ``Magic`` (4 bytes, ``PFA1``), then the blobs back-to-back, then the
  footer: ``Magic``, FooterPayload (UTF-8 JSON, optionally
  LZ4-compressed), FooterPayloadSize (int32 LE), Flags (4 bytes; byte 0
  bit 0 = payload compressed), ``Magic``.
- FooterPayload JSON: ``{"blobs": [{type, fields, snapshot-id,
  sequence-number, offset, length, properties...}], "properties": {}}``.

``deletion-vector-v1`` blob layout (table spec v3):

- ``combined length`` of magic + vector as int32 BE,
- magic bytes ``D1 D3 39 64``,
- the serialized RoaringBitmapArray ("portable" format),
- CRC-32 of magic + vector as int32 BE.

The delete manifest entry for a DV records ``referenced_data_file``
(the ONE data file the vector applies to), ``content_offset`` (the
blob's offset in the Puffin file — the start of the length field) and
``content_size_in_bytes`` (the blob's full stored length, matching the
footer blob metadata's ``length``).
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

from sling_cli_spark import fsio
from sling_cli_spark.sources.delta_dv import (
    deserialize_bitmap, serialize_bitmap)

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"
_DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))
_FLAG_FOOTER_COMPRESSED = 1  # byte 0, bit 0


# ------------------------------------------------------------ DV blobs

def dv_blob(indices) -> bytes:
    """Row indices -> stored ``deletion-vector-v1`` blob bytes
    (length + magic + portable bitmap + CRC-32)."""
    vec = serialize_bitmap(indices)
    body = _DV_MAGIC + vec
    return (struct.pack(">i", len(body)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def dv_blob_indices(blob: bytes) -> np.ndarray:
    """Stored DV blob bytes -> sorted int64 deleted row indices.
    Verifies the length framing, magic and CRC — a corrupt vector must
    fail loudly, never resurrect or over-delete rows."""
    (ln,) = struct.unpack_from(">i", blob, 0)
    if len(blob) < 4 + ln + 4:
        raise ValueError(
            f"deletion-vector blob truncated: header says {ln} bytes")
    body = blob[4:4 + ln]
    if body[:4] != _DV_MAGIC:
        raise ValueError("bad deletion-vector magic "
                         f"{body[:4].hex()} (want {_DV_MAGIC.hex()})")
    (crc,) = struct.unpack_from(">I", blob, 4 + ln)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector CRC mismatch")
    return deserialize_bitmap(body[4:])


# --------------------------------------------------------- file writer

def write_puffin(
    path: str, blobs: list[tuple[dict, bytes]],
    properties: dict | None = None,
) -> list[dict]:
    """Write a Puffin file of ``(blob_metadata, blob_bytes)`` pairs.

    Returns the blob-metadata list with ``offset``/``length`` filled in
    (the caller lifts ``offset`` into the delete manifest's
    ``content_offset``). ``blob_metadata`` should carry ``type``,
    ``fields``, ``snapshot-id``, ``sequence-number`` and any
    ``properties`` (e.g. ``referenced-data-file``, ``cardinality``);
    the footer is written uncompressed.
    """
    out = bytearray(MAGIC)
    metas: list[dict] = []
    for meta, data in blobs:
        m = dict(meta)
        m["offset"] = len(out)
        m["length"] = len(data)
        out += data
        metas.append(m)
    payload = json.dumps(
        {"blobs": metas, "properties": properties or {}}).encode()
    out += MAGIC + payload + struct.pack("<i", len(payload))
    out += bytes(4) + MAGIC  # flags: uncompressed footer
    fsio.get_fs(path).write_bytes(path, bytes(out))
    return metas


# --------------------------------------------------------- file reader

def read_footer(path: str, data: bytes | None = None) -> dict:
    """Read a Puffin file's footer payload ({"blobs": [...],
    "properties": {...}}). ``data`` supplies pre-read file bytes."""
    if data is None:
        data = fsio.get_fs(path).read_bytes(path)
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"not a puffin file: {path}")
    flags = data[-8:-4]
    if flags[0] & _FLAG_FOOTER_COMPRESSED:
        raise ValueError(
            f"puffin footer at {path} is LZ4-compressed — unsupported "
            "here (lz4 is not available); rewrite with an uncompressed "
            "footer")
    (size,) = struct.unpack_from("<i", data, len(data) - 12)
    payload = data[len(data) - 12 - size:len(data) - 12]
    return json.loads(payload.decode())


def read_blob(path: str, offset: int, length: int) -> bytes:
    """Read one blob's stored bytes by footer/manifest coordinates."""
    data = fsio.get_fs(path).read_bytes(path)
    blob = data[offset:offset + length]
    if len(blob) != length:
        raise ValueError(
            f"puffin blob at {path}:{offset} truncated "
            f"({len(blob)} of {length} bytes)")
    return blob
