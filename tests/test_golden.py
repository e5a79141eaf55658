"""Golden-image regression: re-render the committed golden configs on the
CPU backend and compare RMSE (SURVEY section 4 item 5).

Regenerate with tools/gen_goldens.py ONLY on intentional estimator changes.
"""

import os

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import gen_goldens  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _rmse(a, b):
    a = a.astype(np.float64) / 255.0
    b = b.astype(np.float64) / 255.0
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.mark.parametrize("cfg", gen_goldens.CONFIGS, ids=lambda c: c[0])
def test_golden(cfg):
    from bpt_tpu.utils.png import read_png

    name, kind, integ, width, spp, depth = cfg
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    # goldens are committed; a missing one is a broken checkout or an
    # accidental deletion — FAIL, don't degrade to a silent skip
    assert os.path.exists(path), (
        f"golden missing: {path} (committed file — regenerate only on "
        f"intentional estimator changes with tools/gen_goldens.py)")
    golden = read_png(path)
    img = np.asarray(gen_goldens.render_config(name, kind, integ, width, spp, depth))
    assert img.shape == golden.shape
    # identical platform + deterministic keys: should be exact; allow a hair
    # of slack for XLA version drift
    rmse = _rmse(img, golden)
    assert rmse < 0.004, f"golden drift: rmse={rmse}"
