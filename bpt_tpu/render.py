"""CLI entry point.

Mirrors the reference binary (``RayTracer [scene.yaml]``, src/main.cpp:62-78):
no argument renders the built-in cornell box; a YAML path renders that scene.
Extra flags extend the surface (integrator choice, overrides, checkpointing)
without changing defaults.

Usage:
    python -m bpt_tpu.render [scene.yaml] [--spp N] [--size WxH]
        [--integrator pt|bdpt|bdpt-mis] [--max-depth N] [--output FILE] [--seed N]
        [--checkpoint FILE] [--f64] [--no-progress]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene", nargs="?", default=None, help="YAML scene file")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--size", type=str, default=None, help="WxH")
    ap.add_argument("--integrator", choices=("pt", "bdpt", "bdpt-mis"), default=None)
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--output", type=str, default=None)
    ap.add_argument("--output-dir", type=str, default="output")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk-size", type=int, default=None)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="npz path for save/resume")
    ap.add_argument("--f64", action="store_true",
                    help="double precision (CPU backend)")
    ap.add_argument("--no-progress", action="store_true")
    args = ap.parse_args(argv)

    import jax

    from bpt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    dtype = jnp.float64 if args.f64 else jnp.float32

    from bpt_tpu.models.render import render
    from bpt_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from bpt_tpu.utils.png import write_png

    overrides = {}
    if args.spp is not None:
        overrides["samples_per_pixel"] = args.spp
    if args.max_depth is not None:
        overrides["max_depth"] = args.max_depth
    if args.integrator is not None:
        overrides["integrator"] = args.integrator
    if args.output is not None:
        overrides["file_name"] = args.output
    if args.size is not None:
        try:
            w, h = (int(x) for x in args.size.lower().split("x"))
            if w <= 0 or h <= 0:
                raise ValueError
        except ValueError:
            ap.error(f"--size must be WxH (e.g. 1280x720), got {args.size!r}")
        overrides["image_width"] = w
        overrides["aspect_ratio"] = w / h

    try:
        if args.scene:
            from bpt_tpu.scene.loader import load_scene_from_yaml

            loaded = load_scene_from_yaml(
                args.scene, dtype=dtype, camera_overrides=overrides
            )
            scene, cfg = loaded.scene, loaded.camera
        else:
            from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

            scene = cornell_box(dtype=dtype)
            cfg = cornell_box_camera()
            if overrides:
                cfg = dataclasses.replace(cfg, **overrides)
    except Exception as ex:  # main.cpp:72-75
        print(f"Failed to load scene: {ex}", file=sys.stderr)
        return 1

    resume = None
    if args.checkpoint and os.path.exists(args.checkpoint):
        resume = load_checkpoint(args.checkpoint)
        print(f"Resuming from {args.checkpoint} "
              f"({resume['strata_done']} strata done)", file=sys.stderr)

    cb = None
    if args.checkpoint:
        cb = lambda state: save_checkpoint(args.checkpoint, state)  # noqa: E731

    result = render(
        scene,
        cfg,
        seed=args.seed,
        chunk_size=args.chunk_size,
        progress=not args.no_progress,
        resume=resume,
        stratum_callback=cb,
    )
    path = write_png(cfg.file_name, result.rgb8(), output_dir=args.output_dir)
    print(result.stats.summary(), file=sys.stderr)
    print(f"Wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
