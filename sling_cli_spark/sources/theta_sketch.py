"""Theta sketches for Iceberg table statistics (Puffin
``apache-datasketches-theta-v1`` blobs).

Public sources only: the Apache DataSketches theta sketch paper/format
(datasketches.apache.org — CompactSketch serial version 3 layout), the
MurmurHash3 x64_128 reference algorithm (Austin Appleby, public
domain), and the Iceberg Puffin spec, which defines the blob as "a
serialized form of a 'compact' Theta sketch" updated with Iceberg's
single-value binary serialization of each value (spec Appendix D —
:func:`sling_cli_spark.sources.iceberg_py._encode_bound` is the shared
encoder) and carries the ``ndv`` blob-metadata property readers
actually consume for planning.

The reference engine (slingdata-io/sling-cli) delegates Iceberg
entirely to DuckDB's extension (core/dbio/iop/iceberg.go) and has no
ANALYZE surface; this module is beyond-reference spec surface so the
engine can exchange NDV statistics with warehouses that write them
(Spark's ANALYZE TABLE, Trino's ANALYZE).

Serialization layout (DataSketches CompactSketch, SerVer 3, ordered):

- preamble byte 0: number of preamble longs (1 empty/single, 2 exact,
  3 estimation), byte 1: serial version 3, byte 2: family 3 (COMPACT),
  bytes 3-4: unused for compact, byte 5: flags (0x02 read-only |
  0x04 empty | 0x08 compact | 0x10 ordered), bytes 6-7: seed hash.
- exact mode (theta = 1.0): long 1 = retained-entry count (int32 LE),
  then the retained 63-bit hash values as int64 LE, ascending.
- estimation mode: long 1 = count, long 2 = thetaLong, then hashes.

Hash pipeline (DataSketches update semantics): murmur3_x64_128 of the
value bytes with the library's default update seed 9001, keep the
first 64-bit half logically shifted right by one (a 63-bit positive
value; 0 is never retained), retain while < thetaLong.
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
DEFAULT_UPDATE_SEED = 9001  # DataSketches ThetaUtil.DEFAULT_UPDATE_SEED
THETA_BLOB_TYPE = "apache-datasketches-theta-v1"
_FAMILY_COMPACT = 3
_SER_VER = 3
_F_READONLY, _F_EMPTY, _F_COMPACT, _F_ORDERED = 0x02, 0x04, 0x08, 0x10


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64_128 (reference algorithm) -> (h1, h2) as
    unsigned 64-bit ints. Verified against the mmh3 package's
    published vectors in tests/test_theta_sketch.py."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o:o + 8], "little")
        k2 = int.from_bytes(data[o + 8:o + 16], "little")
        k1 = (k1 * c1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16:]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def update_hash(value_bytes: bytes,
                seed: int = DEFAULT_UPDATE_SEED) -> int:
    """One value's 63-bit theta hash (DataSketches update pipeline:
    first murmur half, logical shift right 1; 0 is discarded by the
    caller)."""
    return murmur3_x64_128(value_bytes, seed)[0] >> 1


def seed_hash(seed: int = DEFAULT_UPDATE_SEED) -> int:
    """DataSketches ``computeSeedHash``: low 16 bits of
    murmur3(seed as int64 LE, seed=0).h1 — recorded in every sketch so
    a reader with a different update seed fails instead of merging
    incompatible hashes."""
    sh = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to the reserved 0")
    return sh


def sketch_from_hashes(hashes, k: int = 4096,
                       seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Distinct 63-bit update hashes -> serialized ordered
    CompactSketch. With at most ``k`` distinct hashes the sketch is
    EXACT (theta = 1, estimate == true NDV); beyond that it keeps the
    k smallest with theta = the (k+1)-th smallest (the classic KMV
    view of a theta sketch)."""
    hs = sorted({int(h) for h in hashes if int(h) != 0})
    sh = seed_hash(seed)
    if not hs:
        pre = struct.pack(
            "<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0,
            _F_READONLY | _F_EMPTY | _F_COMPACT | _F_ORDERED, sh)
        return pre
    flags = _F_READONLY | _F_COMPACT | _F_ORDERED
    if len(hs) <= k:
        pre = struct.pack("<BBBBBBH", 2, _SER_VER, _FAMILY_COMPACT,
                          0, 0, flags, sh)
        body = struct.pack("<iI", len(hs), 0)
        return pre + body + b"".join(
            struct.pack("<q", h) for h in hs)
    theta = hs[k]
    kept = hs[:k]
    pre = struct.pack("<BBBBBBH", 3, _SER_VER, _FAMILY_COMPACT,
                      0, 0, flags, sh)
    body = struct.pack("<iI", len(kept), 0) + struct.pack("<q", theta)
    return pre + body + b"".join(struct.pack("<q", h) for h in kept)


def parse_sketch(blob: bytes) -> dict:
    """Parse a serialized theta CompactSketch (SerVer 3: our own
    writes AND foreign ANALYZE output) ->
    ``{"entries": n, "theta": float, "estimate": float,
    "seed_hash": int}``. Handles empty (preamble-longs 1 + empty
    flag), the single-item form (preamble-longs 1, one hash), exact
    (2) and estimation (3) layouts."""
    if len(blob) < 8:
        raise ValueError("theta sketch blob shorter than one preamble")
    pre_longs = blob[0] & 0x3F
    ser_ver = blob[1]
    family = blob[2]
    flags = blob[5]
    sh = struct.unpack_from("<H", blob, 6)[0]
    if ser_ver != _SER_VER:
        raise ValueError(
            f"theta sketch serial version {ser_ver} unsupported "
            f"(expect {_SER_VER})")
    if family != _FAMILY_COMPACT:
        raise ValueError(
            f"not a compact theta sketch (family {family})")
    if flags & _F_EMPTY:
        return {"entries": 0, "theta": 1.0, "estimate": 0.0,
                "seed_hash": sh}
    if pre_longs == 1:  # single-item sketch
        return {"entries": 1, "theta": 1.0, "estimate": 1.0,
                "seed_hash": sh}
    count = struct.unpack_from("<i", blob, 8)[0]
    if pre_longs == 2:
        theta_long = (1 << 63) - 1
    elif pre_longs == 3:
        theta_long = struct.unpack_from("<q", blob, 16)[0]
    else:
        raise ValueError(
            f"theta sketch preamble-longs {pre_longs} unsupported")
    theta = theta_long / float(1 << 63)
    est = count / theta if theta > 0 else float(count)
    return {"entries": count, "theta": theta, "estimate": est,
            "seed_hash": sh}
