"""Checkpoint/resume for long renders.

The reference loses everything on interruption (framebuffer only lives in
memory, src/camera.h:55,139-142).  Here the accumulated sample sum +
stratum count + seed snapshot to an .npz after each sample stratum; resume
reloads and continues the running sum.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, state: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f,
            framebuffer_sum=state["framebuffer_sum"],
            strata_done=np.int64(state["strata_done"]),
            seed=np.int64(state.get("seed", 0)),
        )
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with np.load(path) as z:
        return dict(
            framebuffer_sum=z["framebuffer_sum"],
            strata_done=int(z["strata_done"]),
            seed=int(z["seed"]),
        )
