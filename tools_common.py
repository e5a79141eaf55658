"""Shared procedural-mesh helpers for the scene generators in tools/."""

from __future__ import annotations

import math


def cylinder(cx, cz, y0, y1, r, sides=48, cap_bottom=True, cap_top=True):
    tris = []
    for k in range(sides):
        a0 = 2 * math.pi * k / sides
        a1 = 2 * math.pi * (k + 1) / sides
        x0, z0 = cx + r * math.cos(a0), cz + r * math.sin(a0)
        x1, z1 = cx + r * math.cos(a1), cz + r * math.sin(a1)
        tris.append(((x0, y0, z0), (x1, y0, z1), (x1, y1, z1)))
        tris.append(((x0, y0, z0), (x1, y1, z1), (x0, y1, z0)))
        if cap_bottom:
            tris.append(((cx, y0, cz), (x1, y0, z1), (x0, y0, z0)))
        if cap_top:
            tris.append(((cx, y1, cz), (x0, y1, z0), (x1, y1, z1)))
    return tris


def sphere(cx, cy, cz, r, lat=16, lon=32):
    tris = []

    def pt(th, ph):
        st = math.sin(th)
        return (cx + r * st * math.cos(ph), cy + r * math.cos(th),
                cz + r * st * math.sin(ph))

    for i in range(lat):
        th0 = math.pi * i / lat
        th1 = math.pi * (i + 1) / lat
        for j in range(lon):
            ph0 = 2 * math.pi * j / lon
            ph1 = 2 * math.pi * (j + 1) / lon
            p00, p01 = pt(th0, ph0), pt(th0, ph1)
            p10, p11 = pt(th1, ph0), pt(th1, ph1)
            if i > 0:
                tris.append((p00, p10, p11))
            if i < lat - 1:
                tris.append((p00, p11, p01))
    return tris


def box(ax, ay, az, bx, by, bz, rot_y=0.0, cx=0.0, cz=0.0):
    mn = (min(ax, bx), min(ay, by), min(az, bz))
    mx = (max(ax, bx), max(ay, by), max(az, bz))
    v = {}
    for ix in (0, 1):
        for iy in (0, 1):
            for iz in (0, 1):
                p = [mx[0] if ix else mn[0], mx[1] if iy else mn[1],
                     mx[2] if iz else mn[2]]
                if rot_y:
                    s, c = math.sin(rot_y), math.cos(rot_y)
                    x, z = p[0] - cx, p[2] - cz
                    p[0] = c * x + s * z + cx
                    p[2] = -s * x + c * z + cz
                v[(ix, iy, iz)] = tuple(p)
    f = [
        ((0, 0, 1), (1, 0, 1), (1, 1, 1)), ((0, 0, 1), (1, 1, 1), (0, 1, 1)),
        ((0, 0, 0), (0, 1, 0), (1, 1, 0)), ((0, 0, 0), (1, 1, 0), (1, 0, 0)),
        ((0, 0, 0), (0, 0, 1), (0, 1, 1)), ((0, 0, 0), (0, 1, 1), (0, 1, 0)),
        ((1, 0, 1), (1, 0, 0), (1, 1, 0)), ((1, 0, 1), (1, 1, 0), (1, 1, 1)),
        ((0, 1, 1), (1, 1, 1), (1, 1, 0)), ((0, 1, 1), (1, 1, 0), (0, 1, 0)),
        ((0, 0, 0), (1, 0, 0), (1, 0, 1)), ((0, 0, 0), (1, 0, 1), (0, 0, 1)),
    ]
    return [(v[a], v[b], v[c]) for a, b, c in f]


def write_obj(path, tris):
    with open(path, "w") as fh:
        fh.write("# generated procedural stand-in\n")
        verts = {}
        order = []
        for tri in tris:
            for p in tri:
                if p not in verts:
                    verts[p] = len(verts) + 1
                    order.append(p)
        for p in order:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for tri in tris:
            a, b, c = (verts[p] for p in tri)
            fh.write(f"f {a} {b} {c}\n")
