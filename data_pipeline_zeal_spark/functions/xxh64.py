"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit — the
driver-side half of the versioned table's Bloom file skipping.

The write side sets Bloom bits with the JVM expression
``pmod(xxhash64(col, CAST(i AS BIGINT)), m_bits)``; the read side
(:func:`~..sources.versioned.pruned_paths`) must recompute the SAME
positions for a probe literal WITHOUT a SparkSession (pruning is
metadata-only log replay).  So this module reimplements the public
XXH64 algorithm (Collet's spec; Spark ships a faithful copy in
``org.apache.spark.unsafe.hash.XXH64``) plus Spark's multi-argument
folding rule: the running hash seeds the next field, longs hash via the
8-byte specialization, strings via their UTF-8 bytes, NULLs leave the
hash unchanged, and the initial seed is 42.  Parity with the JVM is
pinned in tests/test_bloom_skipping.py over longs (both signs) and
unicode strings — any drift would silently break pruning correctness,
which is why the test is a law, not a spot check.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit word — Spark's ``XXH64.hashLong``.  ``value``
    is the signed long's two's-complement bit pattern."""
    value &= _MASK
    seed &= _MASK
    h = (seed + _P5 + 8) & _MASK
    h ^= (_rotl((value * _P2) & _MASK, 31) * _P1) & _MASK
    h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 32-bit word — Spark's ``XXH64.hashInt`` (int/short/
    byte/date columns fold through this path)."""
    value &= 0xFFFFFFFF
    seed &= _MASK
    h = (seed + _P5 + 4) & _MASK
    h ^= (value * _P1) & _MASK
    h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string — Spark's
    ``XXH64.hashUnsafeBytes`` (string columns hash their UTF-8 form)."""
    seed &= _MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            w1 = int.from_bytes(data[i : i + 8], "little")
            w2 = int.from_bytes(data[i + 8 : i + 16], "little")
            w3 = int.from_bytes(data[i + 16 : i + 24], "little")
            w4 = int.from_bytes(data[i + 24 : i + 32], "little")
            v1 = (_rotl((v1 + w1 * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + w2 * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + w3 * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + w4 * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = ((h * _P1) + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        w = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((w * _P2) & _MASK, 31) * _P1) & _MASK
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i <= n - 4:
        w = int.from_bytes(data[i : i + 4], "little")
        h ^= (w * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(values, seed: int = 42) -> int:
    """Spark's ``F.xxhash64(*cols)`` folding rule over Python literals:
    the running hash seeds the next field; int → hashLong (Python ints
    stand in for BIGINT columns), str → hashUnsafeBytes(UTF-8),
    bytes → hashUnsafeBytes, None → skipped.  Returns the SIGNED long
    Spark yields."""
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            raise TypeError("boolean bloom columns are pointless — skip")
        if isinstance(v, int):
            h = xxh64_long(v, h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = xxh64_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported bloom literal type: {type(v)}")
    return _to_signed(h)


def bloom_positions(value, k: int, m_bits: int, kind: str = "auto") -> list[int]:
    """The ``k`` Bloom bit positions of one literal — MUST mirror the
    write side's ``pmod(xxhash64(col, CAST(i AS BIGINT)), m_bits)``
    exactly (Python's ``%`` on a signed value IS pmod).

    ``kind`` is the JVM column type's hash family, recorded by the write
    side in the commit entry (``bloom["types"]``): the JVM dispatches
    ``xxhash64`` on the COLUMN type — int/short/byte columns take the
    4-byte ``hashInt`` path even though the Python probe literal is a
    plain ``int`` — so without the hint a probe against an int column
    would hash via ``hashLong`` and produce false NEGATIVES (wrong
    results, not just kept files).  ``"auto"`` keeps the legacy mapping
    (Python int → hashLong) for pre-``types`` commits, which only ever
    bloomed bigint/string columns."""
    if kind == "int":
        if not isinstance(value, int) or isinstance(value, bool):
            raise TypeError(
                f"int-typed bloom column probed with {type(value).__name__}"
            )
        h0 = xxh64_int(value, 42)
    elif kind in ("auto", "long", "string", "binary"):
        if isinstance(value, bool) or not isinstance(
            value, (int, str, bytes, bytearray)
        ):
            raise TypeError(f"unsupported bloom literal type: {type(value)}")
        if isinstance(value, int):
            h0 = xxh64_long(value, 42)
        elif isinstance(value, str):
            h0 = xxh64_bytes(value.encode("utf-8"), 42)
        else:
            h0 = xxh64_bytes(bytes(value), 42)
    else:
        raise ValueError(f"unknown bloom hash kind: {kind!r}")
    return [_to_signed(xxh64_long(i, h0)) % m_bits for i in range(k)]
