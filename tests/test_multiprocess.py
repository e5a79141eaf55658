"""Multi-controller runtime tests: REAL separate OS processes wired by
jax.distributed (gloo collectives on CPU — the DCN analog), not just a
virtual in-process mesh.  Pixel sharding's determinism contract extends
across process counts: 2 processes x 4 devices == 1 process x 8 devices
== the in-process single-device render, bit-for-bit.

Reference analog: the thread-pool render loop
(/root/reference/src/camera.h:57-134) scaled past one process.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.models.render import render
from bpt_tpu.parallel.multiprocess import launch_local
from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

SIZE = "24x24"
SPP = 4
DEPTH = 3


def _run(tmp_path, nproc, local_devices):
    out = tmp_path / f"fb_{nproc}.npy"
    launch_local(
        nproc,
        ["--size", SIZE, "--spp", str(SPP), "--max-depth", str(DEPTH),
         "--seed", "7", "--output", str(out)],
        local_device_count=local_devices,
        timeout=540.0,
    )
    return np.load(out)


def test_two_processes_match_one_process_and_local(tmp_path):
    fb2 = _run(tmp_path, 2, 4)   # 2 procs x 4 devices
    fb1 = _run(tmp_path, 1, 8)   # 1 proc x 8 devices
    np.testing.assert_array_equal(fb2, fb1)

    scene = cornell_box(dtype=jnp.float32)
    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=24, aspect_ratio=1.0,
        samples_per_pixel=SPP, max_depth=DEPTH, integrator="pt")
    local = render(scene, cfg, seed=7)
    np.testing.assert_array_equal(fb2, local.framebuffer_sum)


def test_launch_local_surfaces_worker_failure(tmp_path):
    with pytest.raises(RuntimeError, match="worker .* exited"):
        launch_local(1, ["--size", "notasize", "--output",
                         str(tmp_path / "x.npy")],
                     local_device_count=2, timeout=240.0)
