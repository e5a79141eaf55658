"""Minimal OBJ parser — behavioral clone of the reference's
(src/scene/scene_loader.h:345-397): only 'v' and 'f' lines, face tokens
vi | vi/vt | vi/vt/vn | vi//vn (only vi used), 1-based and negative indices,
fan triangulation, malformed tokens skipped, normals/UVs discarded.
"""

from __future__ import annotations


def parse_obj(path, use_native: bool = True):
    """Return [(v0, v1, v2)] vertex-position triples.

    Uses the C++ parser (bpt_tpu.native) when available; this Python version
    is the fallback and the test oracle."""
    if use_native:
        from bpt_tpu import native

        out = native.parse_obj_native(str(path)) if native.available() else None
        if out is not None:
            return out
    verts: list[tuple] = []
    tris: list[tuple] = []
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                if len(parts) >= 4:
                    try:
                        verts.append(
                            (float(parts[1]), float(parts[2]), float(parts[3]))
                        )
                    except ValueError:
                        pass
            elif tag == "f":
                fidx = []
                for tok in parts[1:]:
                    vi_str = tok.split("/", 1)[0]
                    try:
                        vi = int(vi_str)
                    except ValueError:
                        continue  # skip malformed (scene_loader.h:382-384)
                    idx = vi - 1 if vi > 0 else len(verts) + vi
                    fidx.append(idx)
                if len(fidx) >= 3:
                    for k in range(2, len(fidx)):  # fan (scene_loader.h:386-394)
                        tris.append(
                            (verts[fidx[0]], verts[fidx[k - 1]], verts[fidx[k]])
                        )
    return tris
