"""Cassandra validator (AbstractType) codecs → Spark types.

The reference's SerDe decodes Cassandra's binary cell values into
Hive-typed values per the column-family validators (SURVEY.md §2 A4,
reconstruction [P]). These are the public Cassandra 1.x/2.x value
encodings — all big-endian, as emitted by ``AbstractType.decompose``:

| validator        | wire encoding                  | Spark type       |
| ---------------- | ------------------------------ | ---------------- |
| UTF8Type         | UTF-8 bytes                    | string           |
| AsciiType        | ASCII bytes                    | string           |
| BytesType        | raw bytes                      | binary           |
| LongType         | int64 BE                       | long             |
| Int32Type        | int32 BE                       | int              |
| BooleanType      | 1 byte (0/1)                   | boolean          |
| FloatType        | float32 BE                     | float            |
| DoubleType       | float64 BE                     | double           |
| DecimalType      | int32 scale + BE bigint        | decimal(38,18)   |
| IntegerType      | BE two's-complement varint     | decimal(38,0)    |
| TimestampType    | int64 BE millis since epoch    | timestamp        |
| UUIDType         | 16 bytes                       | string           |
| TimeUUIDType     | 16 bytes                       | string           |
| InetAddressType  | 4 or 16 bytes                  | string           |

Empty cell values decode to NULL (Cassandra's empty-vs-null is
ambiguous for fixed-width types; NULL is the Hive-side convention).
"""

from __future__ import annotations

import decimal
import ipaddress
import struct
import uuid
from datetime import datetime, timezone
from typing import Any, Callable

import pyarrow as pa

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _enc_utf8(v: Any) -> bytes:
    return str(v).encode("utf-8")


def _dec_utf8(b: bytes) -> str:
    return b.decode("utf-8")


def _enc_long(v: Any) -> bytes:
    return struct.pack(">q", int(v))


def _dec_long(b: bytes) -> int:
    return struct.unpack(">q", b)[0]


def _enc_int32(v: Any) -> bytes:
    return struct.pack(">i", int(v))


def _dec_int32(b: bytes) -> int:
    return struct.unpack(">i", b)[0]


def _enc_bool(v: Any) -> bytes:
    return b"\x01" if v else b"\x00"


def _dec_bool(b: bytes) -> bool:
    return b != b"\x00"


def _enc_float(v: Any) -> bytes:
    return struct.pack(">f", float(v))


def _dec_float(b: bytes) -> float:
    return struct.unpack(">f", b)[0]


def _enc_double(v: Any) -> bytes:
    return struct.pack(">d", float(v))


def _dec_double(b: bytes) -> float:
    return struct.unpack(">d", b)[0]


def _enc_varint(v: Any) -> bytes:
    i = int(v)
    length = max(1, (i.bit_length() + 8) // 8)  # +8 keeps the sign bit
    return i.to_bytes(length, "big", signed=True)


def _dec_varint(b: bytes) -> decimal.Decimal:
    return decimal.Decimal(int.from_bytes(b, "big", signed=True))


def _enc_decimal(v: Any) -> bytes:
    d = decimal.Decimal(v)
    sign, digits, exponent = d.as_tuple()
    # Build the unscaled integer from the digit tuple directly:
    # Decimal.scaleb runs under the ambient context (28 significant
    # digits by default) and silently ROUNDS a decimal(38,18) value's
    # low digits away — exact integer arithmetic cannot.
    unscaled = int("".join(map(str, digits)) or "0")
    if sign:
        unscaled = -unscaled
    return struct.pack(">i", -exponent) + _enc_varint(unscaled)


def _dec_decimal(b: bytes) -> decimal.Decimal:
    scale = struct.unpack(">i", b[:4])[0]
    unscaled = int.from_bytes(b[4:], "big", signed=True)
    # Tuple construction is exact; scaleb would round through the
    # ambient 28-digit context (the encode side's bug, mirrored).
    digits = tuple(int(c) for c in str(abs(unscaled)))
    return decimal.Decimal((1 if unscaled < 0 else 0, digits, -scale))


def _enc_timestamp(v: Any) -> bytes:
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        millis = int(v.timestamp() * 1000)
    else:
        millis = int(v)
    return struct.pack(">q", millis)


def _dec_timestamp(b: bytes) -> datetime:
    millis = struct.unpack(">q", b)[0]
    return datetime.fromtimestamp(millis / 1000.0, tz=timezone.utc).replace(tzinfo=None)


def _enc_uuid(v: Any) -> bytes:
    return uuid.UUID(str(v)).bytes


def _dec_uuid(b: bytes) -> str:
    return str(uuid.UUID(bytes=b))


def _enc_inet(v: Any) -> bytes:
    return ipaddress.ip_address(str(v)).packed


def _dec_inet(b: bytes) -> str:
    return str(ipaddress.ip_address(b))


def _identity(b: bytes) -> bytes:
    return bytes(b)


class Validator:
    """One Cassandra AbstractType: codec + type mapping.

    ``order_preserving`` marks validators whose raw byte order equals
    logical value order (safe for partition-key *range* pruning, which
    compares encoded bytes the way Cassandra's ordered partitioners
    do). Signed BE integers are NOT order-preserving across sign, so
    they only get exact-key pruning.
    """

    def __init__(
        self,
        name: str,
        encode: Callable[[Any], bytes],
        decode: Callable[[bytes], Any],
        spark_type: str,
        arrow_type: pa.DataType,
        order_preserving: bool = False,
        np_dtype: str | None = None,
    ) -> None:
        self.name = name
        self.encode = encode
        self.decode = decode
        self.spark_type = spark_type
        self.arrow_type = arrow_type
        self.order_preserving = order_preserving
        # big-endian numpy dtype for fixed-width wire values — enables
        # whole-column frombuffer decode in the scan's Arrow batcher
        # (None → per-value Python decode)
        self.np_dtype = np_dtype


VALIDATORS: dict[str, Validator] = {
    v.name: v
    for v in (
        Validator("UTF8Type", _enc_utf8, _dec_utf8, "string", pa.string(), True),
        Validator("AsciiType", _enc_utf8, _dec_utf8, "string", pa.string(), True),
        Validator("BytesType", _identity, _identity, "binary", pa.binary(), True),
        Validator("LongType", _enc_long, _dec_long, "long", pa.int64(), np_dtype=">i8"),
        Validator("Int32Type", _enc_int32, _dec_int32, "int", pa.int32(), np_dtype=">i4"),
        Validator("BooleanType", _enc_bool, _dec_bool, "boolean", pa.bool_(), np_dtype="|u1"),
        Validator("FloatType", _enc_float, _dec_float, "float", pa.float32(), np_dtype=">f4"),
        Validator("DoubleType", _enc_double, _dec_double, "double", pa.float64(), np_dtype=">f8"),
        Validator(
            "DecimalType", _enc_decimal, _dec_decimal, "decimal(38,18)", pa.decimal128(38, 18)
        ),
        Validator("IntegerType", _enc_varint, _dec_varint, "decimal(38,0)", pa.decimal128(38, 0)),
        Validator("TimestampType", _enc_timestamp, _dec_timestamp, "timestamp", pa.timestamp("us")),
        Validator("UUIDType", _enc_uuid, _dec_uuid, "string", pa.string()),
        Validator("TimeUUIDType", _enc_uuid, _dec_uuid, "string", pa.string()),
        Validator("InetAddressType", _enc_inet, _dec_inet, "string", pa.string()),
    )
}


def get_validator(name: str) -> Validator:
    try:
        return VALIDATORS[name]
    except KeyError:
        raise ValueError(
            f"unknown validator {name!r}; known: {sorted(VALIDATORS)}"
        ) from None
