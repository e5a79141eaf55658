"""Film pipeline tests: rgb8 conversion math (wpng.h:14-35) + PNG roundtrip."""

import jax.numpy as jnp
import numpy as np

from bpt_tpu.ops.film import to_rgb8
from bpt_tpu.utils.png import encode_png, read_png, write_png


def test_to_rgb8_math():
    fb = jnp.asarray(
        [[[0.0, 0.5, 2.0], [4.0, 0.25, np.nan]]], jnp.float64
    )  # [1,2,3], sums over 4 samples
    out = np.asarray(to_rgb8(fb, 4))
    # c = sum/4 -> [0, .125, .5], [1.0, .0625, nan->0]
    exp0 = [int(256 * np.sqrt(v)) for v in (0.0, 0.125, 0.5)]
    exp1 = [int(256 * np.sqrt(0.999)), int(256 * np.sqrt(0.0625)), 0]
    assert out[0, 0].tolist() == exp0
    assert out[0, 1].tolist() == exp1


def test_to_rgb8_spp_floor_one():
    fb = jnp.asarray([[[0.25, 0.25, 0.25]]], jnp.float64)
    assert np.array_equal(np.asarray(to_rgb8(fb, 0)), np.asarray(to_rgb8(fb, 1)))


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    path = write_png("t.png", img, output_dir=str(tmp_path))
    back = read_png(path)
    assert np.array_equal(back, img)


def test_png_output_dir_created(tmp_path):
    img = np.zeros((2, 2, 3), np.uint8)
    path = write_png("a.png", img, output_dir=str(tmp_path / "out" / "deep"))
    assert path.endswith("a.png")
    assert read_png(path).shape == (2, 2, 3)


def test_encode_png_signature():
    img = np.zeros((1, 1, 3), np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
