"""Scalar helper operators from the reference's mapper surface.

P11: IP-pair → u64 packing (reference YahooBenchmarkSource.convert_ip_pair,
sbx/YahooBenchmarkSource.h:171-202 — inet_pton of both halves of an
"a.b.c.d-e.f.g.h" string into one u64, hi 32 bits = first address).
Expressed as pure built-in string/arithmetic expressions — one codegen
stage, no UDF, evaluated in the scan stage wherever it is used.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ipv4_to_u32(ip: Column) -> Column:
    """Dotted-quad string → unsigned-32 value (as LongType)."""
    o = F.split(ip, r"\.")
    return (
        o[0].cast("long") * 16777216
        + o[1].cast("long") * 65536
        + o[2].cast("long") * 256
        + o[3].cast("long")
    )


def ip_pair_pack(pair: Column) -> Column:
    """"a.b.c.d-e.f.g.h" → one 64-bit value: first address in the high 32
    bits, second in the low 32 (the reference's convert_ip_pair layout).

    Spark LongType is signed: a first octet >= 128 would overflow into the
    sign bit. The reference stores an unsigned u64 so its bit pattern is
    identical; callers needing the printable unsigned value on high-range
    addresses should treat the result as a bit pattern (or mask to
    UNSIGNED via DECIMAL) — the packing itself is lossless either way.
    """
    halves = F.split(pair, "-")
    return ipv4_to_u32(halves[0]) * F.lit(4294967296).cast("long") + ipv4_to_u32(
        halves[1]
    )
