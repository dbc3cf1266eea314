"""MurmurHash3 x64 128-bit — pure Python, bit-exact with Cassandra.

Cassandra's ``MurmurHash.hash3_x64_128`` (public source, itself a port
of Austin Appleby's public-domain reference) drives both the
Murmur3Partitioner token and the jb-era bloom filters. Real
``Filter.db`` membership tests need the exact same bits, so this
implementation mirrors the Java code's signed-64-bit arithmetic
(results are returned as SIGNED i64 pairs, matching ``long[]``).

Pure Python is fine here: blooms hash one key per pruning decision on
the driver/planner path, never per-cell in the decode hot loop.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFFFFFFFFFF

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def _signed(x: int) -> int:
    return x - (1 << 64) if x & (1 << 63) else x


def hash3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """(h1, h2) as SIGNED 64-bit ints — Java ``long[2]`` semantics."""
    n = len(key)
    nblocks = n // 16
    h1 = h2 = seed & _MASK

    for b in range(nblocks):
        off = b * 16
        k1 = int.from_bytes(key[off : off + 8], "little")
        k2 = int.from_bytes(key[off + 8 : off + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK

    # Tail bytes are SIGN-EXTENDED before the shifted XOR — Cassandra's
    # MurmurHash tail switch uses ``(long) key.get(i)`` with no
    # ``& 0xff`` (unlike its block loads, which mask per byte). This is
    # a known divergence from canonical murmur3: for pure-ASCII tails
    # the two agree, but any tail byte >= 0x80 XORs sign bits into the
    # other byte lanes. Real Filter.db membership depends on matching
    # Cassandra's bits, not the reference function's.
    tail = key[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    if t >= 9:
        for i in range(8, min(t, 16)):
            b = tail[i] - 256 if tail[i] >= 128 else tail[i]
            k2 ^= b << (8 * (i - 8))
        k2 &= _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if t >= 1:
        for i in range(min(t, 8)):
            b = tail[i] - 256 if tail[i] >= 128 else tail[i]
            k1 ^= b << (8 * i)
        k1 &= _MASK
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1

    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return _signed(h1), _signed(h2)
