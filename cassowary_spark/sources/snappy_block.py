"""Pure-Python Snappy raw-block decompressor (public format spec).

Cassandra 1.x-era clusters defaulted to ``SnappyCompressor``; its
chunks are single raw Snappy blocks (the framing format is not used
for sstables). A block is a varint uncompressed length followed by
tagged elements:

- tag & 3 == 0: literal; length-1 in the tag's high 6 bits, with
  values 60-63 meaning the length is in the next 1-4 little-endian
  bytes;
- tag & 3 == 1: copy, 4-11 byte length, 11-bit offset (3 high tag
  bits + next byte);
- tag & 3 == 2: copy, 1-64 byte length (high 6 bits + 1), 16-bit LE
  offset in the next two bytes;
- tag & 3 == 3: copy with 32-bit LE offset (rare; large blocks only).

Copies may overlap their output (run-length encoding), exactly like
LZ4 matches. Decode-only: the writer keeps deflate/LZ4 — reading
legacy snapshots is the compatibility need.
"""

from __future__ import annotations


def _varint(src: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = src[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def decompress(src: bytes) -> bytes:
    """Decode one raw Snappy block (self-describing length)."""
    out_len, pos = _varint(src, 0)
    out = bytearray()
    n = len(src)
    while pos < n:
        tag = src[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = int.from_bytes(src[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            out += src[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | src[pos]
            pos += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            off = int.from_bytes(src[pos : pos + 2], "little")
            pos += 2
        else:
            ln = (tag >> 2) + 1
            off = int.from_bytes(src[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError(f"corrupt snappy block: offset {off} at {len(out)}")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy — double the span (bytes: see lz4_block)
            span = bytes(out[start:])
            while len(span) < ln:
                span += span
            out += span[:ln]
    if len(out) != out_len:
        raise ValueError(
            f"corrupt snappy block: decoded {len(out)} bytes, expected {out_len}"
        )
    return bytes(out)


def compress(src: bytes) -> bytes:
    """Minimal VALID Snappy encoding: all-literal elements. Used only
    to generate test fixtures; any conforming decoder reads it."""
    out = bytearray()
    n = len(src)
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    pos = 0
    while pos < n:
        ln = min(n - pos, 65536)
        lm1 = ln - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < 256:
            out.append(60 << 2)
            out.append(lm1)
        else:
            out.append(61 << 2)
            out += lm1.to_bytes(2, "little")
        out += src[pos : pos + ln]
        pos += ln
    return bytes(out)
