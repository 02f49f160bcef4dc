"""InetAddressPoint: IP addresses as 1-dim 16-byte points.

Reference: lucene/core/src/java/org/apache/lucene/document/
InetAddressPoint.java — every address is encoded as its 16-byte IPv6
form (IPv4 becomes the RFC-4291 v4-mapped ::ffff:a.b.c.d, :54-57,170-180)
and compared as an unsigned big-endian integer; ``newExactQuery`` is a
degenerate range, ``newPrefixQuery`` (:209-236) a CIDR range
[network, network | hostmask], and nextUp/nextDown (:92-117) add or
subtract one with byte carry.

The indexed arm maps the 128-bit value onto the engine's int64 point
tree as ``value - v4-mapped base`` — exact for any v4-mapped or small
address (covers the derived corpus); a general IPv6 corpus would need
byte-lexicographic BKD keys (documented scope limit).
"""

from __future__ import annotations

import ipaddress

BYTES = 16
# ::ffff:0.0.0.0 as a 128-bit int — the v4-mapped base (rfc4291)
V4_MAPPED_BASE = 0xFFFF << 32
_MAX = (1 << 128) - 1


def encode(ip: str) -> bytes:
    """16-byte encoding; IPv4 is v4-mapped (InetAddressPoint.encode)."""
    addr = ipaddress.ip_address(ip)
    if addr.version == 4:
        return (V4_MAPPED_BASE + int(addr)).to_bytes(BYTES, "big")
    return int(addr).to_bytes(BYTES, "big")


def decode(b: bytes) -> str:
    """Inverse of encode (v4-mapped values print as dotted quads)."""
    if len(b) != BYTES:
        raise ValueError("encoded bytes are of incorrect length")
    v = int.from_bytes(b, "big")
    if V4_MAPPED_BASE <= v <= V4_MAPPED_BASE + 0xFFFFFFFF:
        return str(ipaddress.ip_address(v - V4_MAPPED_BASE))
    return str(ipaddress.ip_address(v))


def as_int(ip: str) -> int:
    return int.from_bytes(encode(ip), "big")


def next_up(ip: str) -> str:
    """InetAddressPoint.nextUp: the immediately following address."""
    v = as_int(ip)
    if v == _MAX:
        raise ArithmeticError(f"{ip} is the maximum address")
    return decode((v + 1).to_bytes(BYTES, "big"))


def next_down(ip: str) -> str:
    v = as_int(ip)
    if v == 0:
        raise ArithmeticError(f"{ip} is the minimum address")
    return decode((v - 1).to_bytes(BYTES, "big"))


def prefix_range(ip: str, prefix_length: int) -> tuple[int, int]:
    """CIDR network -> inclusive [lo, hi] 128-bit ints
    (newPrefixQuery: lower = network, upper = network | hostmask).
    ``prefix_length`` counts from the 128-bit form; an IPv4 address
    accepts 0..32 and is shifted into the v4-mapped space like the
    reference (which receives a v4 InetAddress and adds 96)."""
    addr = ipaddress.ip_address(ip)
    if addr.version == 4:
        if not 0 <= prefix_length <= 32:
            raise ValueError(f"illegal prefixLength '{prefix_length}'")
        plen = prefix_length + 96
    else:
        if not 0 <= prefix_length <= 128:
            raise ValueError(f"illegal prefixLength '{prefix_length}'")
        plen = prefix_length
    v = as_int(ip)
    host = (1 << (128 - plen)) - 1
    return (v & ~host, v | host)


def range_bounds(lo_ip: str, hi_ip: str) -> tuple[int, int]:
    """newRangeQuery: inclusive [lo, hi] as 128-bit ints."""
    lo, hi = as_int(lo_ip), as_int(hi_ip)
    if lo > hi:
        raise ValueError("lower > upper")
    return lo, hi
