"""End-to-end fidelity vs the REAL reference binary (not the oracle
transcription): render the cornell box with our framework at the exact
config the reference binary rendered (benchmarks/ref_bench.cpp writes
tests/golden/ref_binary/*.png via the reference's own camera/wpng path,
src/camera.h:139-142) and report RMSE on the 8-bit images.

Usage: python tools/ref_rmse.py [--seed N]
Writes a markdown row per integrator; see BASELINE.md for recorded values.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

import numpy as np

GOLD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "golden", "ref_binary")

CONFIGS = [
    ("pt", 256, 256, 10, "ref_pt_256_256.png"),
    ("bdpt", 256, 64, 10, "ref_bdpt_256_64.png"),
]


def rmse_for(integrator, width, spp, depth, gold_name, seed=0):
    from bpt_tpu.models.render import render
    from bpt_tpu.scene.presets import cornell_box, cornell_box_camera
    from bpt_tpu.utils.png import read_png

    gold = read_png(os.path.join(GOLD, gold_name)).astype(np.float64) / 255.0
    scene = cornell_box()
    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=width, samples_per_pixel=spp,
        max_depth=depth, integrator=integrator,
    )
    ours = render(scene, cfg, seed=seed).rgb8().astype(np.float64) / 255.0
    assert ours.shape == gold.shape, (ours.shape, gold.shape)
    rmse = float(np.sqrt(np.mean((ours - gold) ** 2)))
    return rmse, ours, gold


def main():
    seed = int(sys.argv[sys.argv.index("--seed") + 1]) if "--seed" in sys.argv else 0
    for integrator, width, spp, depth, gold in CONFIGS:
        rmse, ours, ref = rmse_for(integrator, width, spp, depth, gold, seed)
        print(f"| cornell {width}x{width}, {spp} spp, depth {depth} "
              f"| {integrator} | {rmse*100:.3f}% |"
              f"  (ours mean {ours.mean():.4f}, ref mean {ref.mean():.4f})")


if __name__ == "__main__":
    main()
