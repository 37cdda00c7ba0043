"""Pure-python XXH64 — independent oracle for Spark's ``xxhash64``.

Implements the public XXH64 algorithm (Yann Collet's xxHash spec) so the
MinHash/SimHash sketches — rows-only in the driver check because DuckDB has
no xxhash64 — get value-level pytest oracles. Spark's ``xxhash64(c1, c2,
...)`` folds left over the arguments with seed 42: each string argument
hashes its UTF-8 bytes, each integral argument hashes its 8-byte
little-endian two's-complement value, and the running hash seeds the next
argument.
"""

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M
    return (_rotl(acc, 31) * P1) & M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    seed &= M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


class I64(int):
    """Marker: hash as an 8-byte long (a LongType column/literal)."""


class I32(int):
    """Marker: hash as a 4-byte int (an IntegerType column/literal —
    what ``F.lit(<small python int>)`` produces)."""


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Spark ``xxhash64(a, b, ...)``: left fold, previous hash seeds next.

    Plain python ints default to the 4-byte IntegerType encoding when they
    fit (mirroring ``F.lit``); wrap in :class:`I64` for LongType inputs.
    """
    h = seed & M
    for a in args:
        if isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, bool):
            raise TypeError("bool not supported in this oracle")
        elif isinstance(a, I64):
            h = xxh64((int(a) & M).to_bytes(8, "little"), h)
        elif isinstance(a, int):
            if isinstance(a, I32) or -(2**31) <= a < 2**31:
                h = xxh64((a & 0xFFFFFFFF).to_bytes(4, "little"), h)
            else:
                h = xxh64((a & M).to_bytes(8, "little"), h)
        else:
            raise TypeError(f"unsupported type {type(a)}")
    return _to_signed(h)
