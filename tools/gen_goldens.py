"""Regenerate the golden regression images (tests/golden/*.png).

Run on the CPU backend so results are reproducible anywhere; the test
suite re-renders the same configs and asserts RMSE under a tight bound.
Regenerate ONLY when an intentional estimator change is made, and say so
in the commit message.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


CONFIGS = [
    # (name, scene, integrator, width, spp, depth)
    ("cornell_pt", "cornell", "pt", 64, 16, 5),
    ("cornell_bdpt", "cornell", "bdpt", 64, 16, 5),
    ("smoke_pt", "smoke", "pt", 48, 9, 5),
    ("earth_pt", "earth", "pt", 48, 9, 4),
]


def build_scene(kind):
    import jax.numpy as jnp

    if kind == "cornell":
        from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

        return cornell_box(dtype=jnp.float32), cornell_box_camera()
    if kind == "smoke":
        from bpt_tpu.scene.presets import cornell_box_camera

        return _smoke_scene_f32(), cornell_box_camera()
    if kind == "earth":
        from bpt_tpu.scene.loader import load_scene_from_yaml

        root = os.path.join(os.path.dirname(__file__), "..")
        loaded = load_scene_from_yaml(
            os.path.join(root, "scenes/earth.yaml"), dtype=jnp.float32,
            verbose=False,
        )
        return loaded.scene, loaded.camera
    raise ValueError(kind)


def _smoke_scene_f32():
    import jax.numpy as jnp

    from bpt_tpu.scene.builder import MaterialSpec, SceneBuilder

    b = SceneBuilder()
    red = MaterialSpec.lambertian((0.65, 0.05, 0.05))
    white = MaterialSpec.lambertian((0.73, 0.73, 0.73))
    green = MaterialSpec.lambertian((0.12, 0.45, 0.15))
    light = MaterialSpec.diffuse_light((7.0, 7.0, 7.0))
    b.add_quad((555, 0, 0), (0, 0, 555), (0, 555, 0), green)
    b.add_quad((0, 0, 555), (0, 0, -555), (0, 555, 0), red)
    b.add_quad((0, 555, 0), (555, 0, 0), (0, 0, 555), white)
    b.add_quad((0, 0, 555), (555, 0, 0), (0, 0, -555), white)
    b.add_quad((555, 0, 555), (-555, 0, 0), (0, 555, 0), white)
    b.add_quad((113, 554, 127), (330, 0, 0), (0, 0, 305), light)
    b.add_volume_box((120, 0.01, 65), (285, 165, 230), density=0.01,
                     albedo=(0.0, 0.0, 0.0), rotate_y_degrees=-18.0)
    b.add_volume_box((265, 0.01, 295), (430, 330, 460), density=0.005,
                     albedo=(1.0, 1.0, 1.0), rotate_y_degrees=15.0)
    return b.build(dtype=jnp.float32)


def render_config(name, kind, integrator, width, spp, depth):
    import dataclasses

    from bpt_tpu.models.render import render

    scene, cfg = build_scene(kind)
    cfg = dataclasses.replace(
        cfg,
        image_width=width,
        aspect_ratio=1.0,
        samples_per_pixel=spp,
        max_depth=depth,
        integrator=integrator,
    )
    return render(scene, cfg, seed=1234).rgb8()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from bpt_tpu.utils.png import write_png

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, kind, integ, width, spp, depth in CONFIGS:
        img = render_config(name, kind, integ, width, spp, depth)
        path = write_png(f"{name}.png", img, output_dir=out_dir)
        print("wrote", path)


if __name__ == "__main__":
    main()
