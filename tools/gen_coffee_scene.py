"""Generate the stand-in "coffee machine" scene (~100k triangles).

The reference's scenes/coffee_machine.yaml references OBJ assets
(data/coffee_maker/*.obj) that are not in its repo; this generates dense
procedural stand-ins with the same structure and materials (orange/black
plastic, metal, glass, floor + three inline mesh lights) at a triangle
count in the 100k class — the BASELINE "larger mesh BVH, multi-material"
workload for the clustered traversal path.

Usage: python tools/gen_coffee_scene.py [outdir=scenes/coffee]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools_common import cylinder, sphere, box, write_obj  # noqa: E402

YAML = """\
# Stand-in for the reference's coffee_machine.yaml (assets absent from its
# repo); same schema, material names/values, and light meshes.
camera:
  resolution: [800, 800]
  fov: 30
  location: [-0.02, 0.22, 0.85]
  look_at: [0.0, 0.16, 0.02]
  samples_per_pixel: 64
  max_depth: 24
  output: "coffee_standin.png"

materials:
  Plastic_Orange:
    type: lambertian
    color: [255, 97, 3]
  Plastic_Black:
    type: lambertian
    color: [0, 0, 0]
  Glass:
    type: dielectric
    ior: 1.5
  Metal:
    type: metal
    color: [170, 170, 170]
    roughness: 0.1
  Floor:
    type: lambertian
    color: [147, 147, 147]
  Light:
    type: light
    emission: [245, 245, 245]

surfaces:
  - {type: object, smooth: true, file: "data/Plastic_Orange.obj", material: "Plastic_Orange"}
  - {type: object, smooth: true, file: "data/Plastic_Black.obj", material: "Plastic_Black"}
  - {type: object, smooth: true, file: "data/Metal.obj", material: "Metal"}
  - {type: object, smooth: true, file: "data/Glass.obj", material: "Glass"}
  - {type: object, smooth: true, file: "data/Floor.obj", material: "Floor"}
  # light meshes (same quads as the reference scene)
  - type: mesh
    vertices: [[-0.359309, 0.449693, -0.010809], [-0.196537, 0.449693, 0.338256],
               [-0.196537, 0.000849009, 0.338256], [-0.359309, 0.000848979, -0.010809]]
    triangles: [[0, 1, 2], [0, 2, 3]]
    material: "Light"
  - type: mesh
    vertices: [[0.320673, 0.027337, 0.228975], [0.320673, 0.476182, 0.228975],
               [0.325221, 0.476182, -0.136419], [0.325221, 0.027337, -0.136419]]
    triangles: [[0, 1, 2], [0, 2, 3]]
    material: "Light"
  - type: mesh
    vertices: [[0.230128, 0.50385, 0.267372], [-0.230128, 0.50385, 0.267372],
               [-0.230128, 0.50385, -0.192885], [0.230128, 0.50385, -0.192885]]
    triangles: [[0, 1, 2], [0, 2, 3]]
    material: "Light"
"""


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "scenes/coffee"
    data = os.path.join(out, "data")
    os.makedirs(data, exist_ok=True)

    # orange body: tall rounded column + head overhang (dense tessellation)
    orange = (
        cylinder(0, -0.05, 0.0, 0.32, 0.085, sides=2048)
        + cylinder(0, -0.05, 0.32, 0.36, 0.105, sides=2048)
        + sphere(0.0, 0.36, -0.05, 0.1, lat=96, lon=192)
        + box(-0.1, 0.30, -0.15, 0.1, 0.36, 0.06)
    )
    write_obj(os.path.join(data, "Plastic_Orange.obj"), orange)

    # black base + drip tray + head underside
    black = (
        cylinder(0, -0.05, 0.0, 0.02, 0.13, sides=1024)
        + cylinder(0, 0.02, 0.021, 0.028, 0.09, sides=1024)
        + cylinder(0, -0.02, 0.28, 0.30, 0.05, sides=512)
    )
    write_obj(os.path.join(data, "Plastic_Black.obj"), black)

    # metal: filter holder + spout + band
    metal = (
        cylinder(0, 0.02, 0.24, 0.27, 0.045, sides=1024)
        + cylinder(0, 0.02, 0.20, 0.24, 0.012, sides=512)
        + sphere(0.0, 0.33, 0.09, 0.035, lat=64, lon=128)
    )
    write_obj(os.path.join(data, "Metal.obj"), metal)

    # glass carafe on the tray
    glass = (
        cylinder(0, 0.05, 0.028, 0.16, 0.055, sides=1024, cap_top=False)
        + cylinder(0, 0.05, 0.034, 0.161, 0.049, sides=1024, cap_top=False)
    )
    write_obj(os.path.join(data, "Glass.obj"), glass)

    write_obj(os.path.join(data, "Floor.obj"),
              [((-2, 0, -2), (2, 0, -2), (2, 0, 2)),
               ((-2, 0, -2), (2, 0, 2), (-2, 0, 2))])

    with open(os.path.join(out, "coffee_standin.yaml"), "w") as fh:
        fh.write(YAML)
    n = 0
    for f in os.listdir(data):
        with open(os.path.join(data, f)) as fh:
            n += sum(1 for line in fh if line.startswith("f "))
    print(f"wrote {out}/coffee_standin.yaml, total triangles: {n}")


if __name__ == "__main__":
    main()
