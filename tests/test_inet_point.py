"""InetAddressPoint encoding semantics (reference
document/InetAddressPoint.java + TestInetAddressPoint.java)."""

import pytest

from lucene_ray.index import inet


def test_v4_mapped_encoding():
    # IPv4 encodes as rfc4291 v4-mapped: 10 zero bytes, 0xffff, then quad
    assert inet.encode("1.2.3.4") == bytes(10) + b"\xff\xff\x01\x02\x03\x04"
    assert inet.decode(inet.encode("1.2.3.4")) == "1.2.3.4"


def test_v6_encoding_roundtrip():
    assert inet.encode("::1") == bytes(15) + b"\x01"
    assert inet.decode(inet.encode("2001:db8::1")) == "2001:db8::1"
    with pytest.raises(ValueError):
        inet.decode(b"\x00" * 5)


def test_next_up_down_carry():
    assert inet.next_up("1.2.3.255") == "1.2.4.0"
    assert inet.next_down("1.2.4.0") == "1.2.3.255"
    # v4 max carries INTO the v6 space (the reference's byte-add does too)
    assert inet.next_up("255.255.255.255") == "::1:0:0:0"
    assert inet.next_down("0.0.0.0") == "::fffe:ffff:ffff"
    with pytest.raises(ArithmeticError):
        inet.next_up("ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff")
    with pytest.raises(ArithmeticError):
        inet.next_down("::")


def test_prefix_ranges():
    lo, hi = inet.prefix_range("10.0.0.4", 30)
    assert hi - lo == 3 and inet.decode(lo.to_bytes(16, "big")) == "10.0.0.4"
    assert inet.decode(hi.to_bytes(16, "big")) == "10.0.0.7"
    # /32 is exact
    lo, hi = inet.prefix_range("10.1.2.3", 32)
    assert lo == hi == inet.as_int("10.1.2.3")
    # /0 on a v4 address covers the whole v4-mapped /96... no: plen 96
    lo, hi = inet.prefix_range("1.2.3.4", 0)
    assert (lo, hi) == (inet.V4_MAPPED_BASE, inet.V4_MAPPED_BASE + 0xFFFFFFFF)
    with pytest.raises(ValueError):
        inet.prefix_range("1.2.3.4", 33)
    with pytest.raises(ValueError):
        inet.prefix_range("::1", 129)


def test_range_bounds():
    lo, hi = inet.range_bounds("10.0.1.5", "10.0.200.250")
    assert hi - lo == (200 * 256 + 250) - (1 * 256 + 5)
    with pytest.raises(ValueError):
        inet.range_bounds("10.0.0.2", "10.0.0.1")
