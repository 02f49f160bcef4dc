"""Real BMP/PNG header codec: encode -> parse round trip, corruption
detection, and the dimension-derivation parity the mm_image_stats oracle
relies on (width/height from md5 of the content bytes)."""

from __future__ import annotations

import struct
import zlib

import pytest

from lucene_ray.ops.multimodal import (
    PNG_SIG,
    encode_bmp,
    encode_png,
    parse_image_header,
)
from lucene_ray.ops.util import md5_u64, md5_u64_hi


@pytest.mark.parametrize("content", [b"", b"x", b"hello world", bytes(range(256)) * 7])
def test_bmp_round_trip(content):
    payload = encode_bmp(content)
    assert payload[:2] == b"BM"
    (file_size,) = struct.unpack_from("<I", payload, 2)
    assert file_size == len(payload)
    w, h, c, pixels = parse_image_header(payload)
    assert (w, h, c) == (
        128 + md5_u64(content) % 896,
        128 + md5_u64_hi(content) % 896,
        3,
    )
    assert pixels == content


@pytest.mark.parametrize("content", [b"", b"abc", "unicode éà".encode()])
def test_png_round_trip(content):
    payload = encode_png(content)
    assert payload[:8] == PNG_SIG
    w, h, c, pixels = parse_image_header(payload)
    assert (w, h, c) == (
        128 + md5_u64(content) % 896,
        128 + md5_u64_hi(content) % 896,
        3,
    )
    assert pixels == content


def test_png_crc_detects_corruption():
    payload = bytearray(encode_png(b"content"))
    payload[17] ^= 0xFF  # flip a width byte -> IHDR CRC must fail
    with pytest.raises(ValueError, match="CRC"):
        parse_image_header(bytes(payload))
    # and a valid re-CRC'd header parses again
    fixed = bytearray(payload)
    crc = zlib.crc32(bytes(fixed[12:29])) & 0xFFFFFFFF
    struct.pack_into(">I", fixed, 29, crc)
    w, _h, _c, _p = parse_image_header(bytes(fixed))
    assert w != 128 + md5_u64(b"content") % 896  # corrupted width round-trips


def test_unknown_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        parse_image_header(b"GIF89a not supported here")


def test_wav_roundtrip_and_audio_stats(ray_session):
    """encode_wav emits a REAL canonical PCM16 RIFF file (python's stdlib
    wave module must read it), parse_wav_header inverts it, and the
    actor-pool stage emits consistent stats."""
    import io
    import wave

    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops.multimodal import (
        audio_stats,
        encode_wav,
        parse_wav_header,
    )

    payload = encode_wav(b"hello world audio", sample_rate=8000, channels=1)
    with wave.open(io.BytesIO(payload)) as w:  # stdlib parses it
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 17
    rate, ch, n, pcm = parse_wav_header(payload)
    assert (rate, ch, n) == (8000, 1, 17) and len(pcm) == 34

    ds = rd.from_arrow(
        pa.table({"doc_id": [0, 1], "text": ["short", "a much longer clip text"]})
    )
    out = audio_stats(ds).to_pandas().sort_values("doc_id")
    assert list(out["sample_rate"]) == [16000, 16000]
    assert list(out["n_samples"]) == [5, 23]
    assert (out["duration_ms"] == out["n_samples"] * 1000 // 16000).all()
    assert out["clip_fp"].nunique() == 2

    import pytest

    with pytest.raises(ValueError, match="WAV"):
        parse_wav_header(b"RIFFxxxxJUNKfmt ")
