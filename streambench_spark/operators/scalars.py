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

    Spark LongType is signed: a first octet >= 128 lands in the sign bit.
    Built with shiftleft(hi, 32) | lo — bitwise ops are not overflow-
    checked under spark.sql.ansi.enabled, so the packing yields the
    reference's exact u64 bit pattern on every config (a hi*2^32 multiply
    would raise ARITHMETIC_OVERFLOW under ANSI for first octet >= 128).
    Callers needing the printable unsigned value on high-range addresses
    should treat the result as a bit pattern (or widen via DECIMAL) —
    the packing itself is lossless either way.
    """
    halves = F.split(pair, "-")
    return F.shiftleft(ipv4_to_u32(halves[0]), 32).bitwiseOR(ipv4_to_u32(halves[1]))


def _spread16(x: Column) -> Column:
    """Insert a zero bit between each of the low 16 bits (Morton spread,
    the classic magic-number cascade — pure bitwise ops, codegen-fused)."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two columns into one 32-bit Morton
    (Z-order) value. Sorting / range-partitioning a table by this key
    clusters rows that are close in BOTH dimensions, so parquet min/max
    column stats prune selective predicates on either column — the
    standard multi-dimensional layout trick for 100 TB scans. Pure
    integer bit arithmetic: any engine reproduces it exactly.

    Inputs are widened to LONG first: on 32-bit int columns the b-side
    spread reaches bit 30 and its shiftleft(1) would land in the INT
    sign bit, making every key with b >= 32768 negative and destroying
    the sort-clustering the helper promises."""
    return _spread16(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread16(b.cast("long")), 1)
    )
