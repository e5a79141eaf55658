"""Probe: the reference binary's shadow-ray endpoint artifact (round 3).

The reference's visible() (src/camera.h:425-438) advances the shadow origin
by 0.001 along the connection direction AND caps the range at
max_t = dist - 0.001 — placing the endpoint's own surface EXACTLY at max_t.
interval::contains is inclusive, so the Möller–Trumbore t-vs-max_t ulp tie
usually resolves as "occluded": ~86% of genuinely-unoccluded connections are
rejected.  This darkens ALL the reference's BDPT connection transport ~7x
(depth-1 cornell direct lighting: 0.021 linear measured vs 0.126 analytic).

This file reproduces the effect in strict-IEEE numpy f64 with the
reference's operation order.  The C++ measurement against the reference's
own headers lives in the shell recipe at the bottom; recorded results:

    acceptance (ref headers, -O3):            0.1358
    acceptance (ref headers, -O0):            0.1358
    acceptance (ref headers, -march=native):  0.1361
    acceptance (numpy f64, division order):   0.1384
    acceptance (numpy f64, reciprocal-mult):  0.1484
    acceptance (our XLA-f64 any_hit):         0.126   (FMA contraction)

Run: python tools/probe_ref_vis.py
"""
import numpy as np


def mt_t(o, d, v0, e1, e2):
    """Möller–Trumbore t with the reference's operation order
    (triangle.h:41-74)."""
    pvec = np.cross(d, e2)
    det = (e1 * pvec).sum(-1)
    inv = 1.0 / det
    tvec = o - v0
    u = (tvec * pvec).sum(-1) * inv
    qvec = np.cross(tvec, e1)
    v = (d * qvec).sum(-1) * inv
    t = (e2 * qvec).sum(-1) * inv
    hit = (np.abs(det) >= 1e-8) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    return np.where(hit, t, np.inf)


def main():
    rng = np.random.default_rng(0)
    N = 200000
    # cornell floor points -> uniform samples on the light quad
    a = np.stack([rng.uniform(50, 500, N), np.zeros(N),
                  rng.uniform(30, 250, N)], -1)
    u = rng.uniform(0, 1, N)
    v = rng.uniform(0, 1, N)
    b = np.stack([213 + 130 * u, np.full(N, 554.0), 227 + 105 * v], -1)
    v0 = np.array([213.0, 554.0, 227.0])
    e1 = np.array([130.0, 0.0, 0.0])
    e2 = np.array([0.0, 0.0, 105.0])

    dirv = b - a
    dist = np.sqrt((dirv * dirv).sum(-1))
    max_t = dist - 0.001
    for name, du in [("division order (reference)", dirv / dist[:, None]),
                     ("reciprocal-multiply", dirv * (1.0 / dist)[:, None])]:
        o = a + 0.001 * du  # visible()'s advanced origin
        t = np.minimum(mt_t(o, du, v0, e1, e2),
                       mt_t(o, du, v0 + e1 + e2, -e1, -e2))
        occluded = (t >= 0.001) & (t <= max_t)  # inclusive, as the reference
        print(f"{name}: acceptance {1.0 - occluded.mean():.4f}")
    d = np.minimum(mt_t(a + 0.001 * (dirv / dist[:, None]),
                        dirv / dist[:, None], v0, e1, e2), np.inf) - max_t
    fin = np.isfinite(d)
    print("median (t - max_t)/ulp(max_t):",
          float(np.median(d[fin] / np.spacing(max_t[fin]))),
          "— the tie is literal fp equality most of the time")


# C++ measurement against the reference's own headers (read-only -I):
#   write a main() that builds the cornell triangle_collection + BVH
#   (as benchmarks/ref_bench.cpp does), transcribes the 12-line visible()
#   body, and counts acceptance over random floor->light pairs; compile
#   with benchmarks/build_ref_bench.sh's include flags.  Recorded: 13.6%.

if __name__ == "__main__":
    main()
