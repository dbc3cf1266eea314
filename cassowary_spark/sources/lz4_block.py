"""Pure-Python LZ4 *block* codec (public LZ4 block format spec).

Cassandra's default compressor since 1.2/2.0 is ``LZ4Compressor``
(SURVEY.md §1.1 physical layout, reconstruction [P]); each compressed
chunk is the decompressed length as 4 little-endian bytes followed by
one LZ4 block. The container ships no lz4 wheel, so snapshots written
with the default config were unreadable — this module implements the
block format from the public spec so ``_ChunkedData`` can serve them.

The decompressor handles the full format (literal/match extension
bytes, overlapping matches). The compressor is a greedy hash-table
matcher honoring the spec's end conditions (last sequence is
literal-only, no match starts within the final 12 bytes) — every
block it emits is decodable by any conforming LZ4 decoder.

Pure Python is the slow path by design: deflate (zlib, C speed)
remains the write default; LZ4 exists for compatibility with real
default-config snapshot dirs.
"""

from __future__ import annotations

_MIN_MATCH = 4
# spec: the last 5 bytes are always literals; the last match cannot
# start within the last 12 bytes
_TAIL_LITERALS = 12


def compress(src: bytes) -> bytes:
    """One LZ4 block for ``src`` (greedy, 4-byte hash matches)."""
    n = len(src)
    out = bytearray()
    if n == 0:
        out.append(0)  # empty literal-only sequence
        return bytes(out)

    def emit(anchor: int, i: int, mlen: int, off: int) -> None:
        lit = i - anchor
        tok_lit = 15 if lit >= 15 else lit
        tok_mat = 0
        if mlen:
            m = mlen - _MIN_MATCH
            tok_mat = 15 if m >= 15 else m
        out.append((tok_lit << 4) | tok_mat)
        if tok_lit == 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[anchor:i])
        if mlen:
            out.append(off & 0xFF)
            out.append(off >> 8)
            if tok_mat == 15:
                rem = mlen - _MIN_MATCH - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    match_limit = n - _TAIL_LITERALS
    while i < match_limit and i + _MIN_MATCH <= n:
        seq = src[i : i + _MIN_MATCH]
        j = table.get(seq)
        table[seq] = i
        if j is None or i - j > 0xFFFF:
            i += 1
            continue
        mlen = _MIN_MATCH
        max_len = n - 5 - i  # keep the final 5 bytes literal
        while mlen < max_len and src[j + mlen] == src[i + mlen]:
            mlen += 1
        emit(anchor, i, mlen, i - j)
        anchor = i = i + mlen
    emit(anchor, n, 0, 0)  # trailing literal-only sequence
    return bytes(out)


def decompress(src: bytes, out_len: int) -> bytes:
    """Decode one LZ4 block; ``out_len`` is the exact expected size."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if lit:
            out += src[i : i + lit]
            i += lit
        if i >= n:
            break  # last sequence: literals only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0 or off > len(out):
            raise ValueError(f"corrupt LZ4 block: offset {off} at {len(out)}")
        mlen = (token & 0xF) + _MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if off >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping match (run-length): double the copied span
            # instead of byte-at-a-time (bytes, not bytearray —
            # ``ba += ba`` on one object raises BufferError)
            span = bytes(out[start:])
            while len(span) < mlen:
                span += span
            out += span[:mlen]
    if len(out) != out_len:
        raise ValueError(
            f"corrupt LZ4 block: decoded {len(out)} bytes, expected {out_len}"
        )
    return bytes(out)
