"""Real BMP pixel decode / nearest-neighbor resize / re-encode."""

import numpy as np
import ray.data as rd

from lucene_ray.ops.multimodal import (
    decode_bmp_pixels,
    encode_bmp_pixels,
    parse_image_header,
    resize_images,
    resize_nearest,
)


def test_pixel_round_trip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    enc = encode_bmp_pixels(img)
    w, h, ch, _px = parse_image_header(enc)
    assert (w, h, ch) == (7, 5, 3)
    assert np.array_equal(decode_bmp_pixels(enc), img)


def test_resize_nearest_exact():
    # 2x4 image with distinct pixels: resize to 1x2 picks centers
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = resize_nearest(img, 2, 1)
    # y center -> row floor((0+.5)*2/1)=1; x centers -> cols 1 and 3
    assert np.array_equal(out[0, 0], img[1, 1])
    assert np.array_equal(out[0, 1], img[1, 3])
    assert out.shape == (1, 2, 3)


def test_resize_stage_deterministic(ray_session):
    import pyarrow as pa

    rng = np.random.default_rng(11)
    rows = [
        {
            "doc_id": i,
            "payload": encode_bmp_pixels(
                rng.integers(0, 256, size=(40 + i, 60, 3), dtype=np.uint8)
            ),
        }
        for i in range(20)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    a = resize_images(ds, target=32).to_pandas().sort_values("doc_id")
    b = resize_images(ds, target=32).to_pandas().sort_values("doc_id")
    assert (a["rs_width"] == 32).all() and (a["rs_height"] == 32).all()
    assert a["out_sha"].tolist() == b["out_sha"].tolist()
    assert a["out_sha"].nunique() == 20
