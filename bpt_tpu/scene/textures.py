"""Texture table construction (host) + batched texture evaluation (device).

Reference classes: solid_color / checker_texture / image_texture /
noise_texture (src/materials/textures/texture.h:14-87) and the perlin lattice
(src/materials/textures/perlin.h).  Images are decoded host-side (Pillow
replaces the vendored stb_image, src/image/external/stb_image.h) into a
padded atlas; the device fetch reproduces the reference's clamped, V-flipped,
nearest-neighbor byte lookup (texture.h:57-73) for bit-parity.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from bpt_tpu.scene.types import (
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
    TEX_SOLID,
    TextureTable,
)

_MAGENTA = np.array([255.0, 0.0, 255.0])  # load-failure fallback pixel
# (reference: src/image/rtw_stb_image.h:63-67)
_CYAN = (0.0, 1.0, 1.0)  # missing-image debug color (texture.h:56)


@dataclass(frozen=True)
class TextureSpec:
    """Host-side texture description used by SceneBuilder / loader."""

    kind: int = TEX_SOLID
    color0: tuple = (0.0, 0.0, 0.0)
    color1: tuple = (0.0, 0.0, 0.0)
    scale: float = 1.0
    image_path: Optional[str] = None

    @staticmethod
    def solid(color):
        return TextureSpec(kind=TEX_SOLID, color0=tuple(color))

    @staticmethod
    def checker(scale, even, odd):
        return TextureSpec(
            kind=TEX_CHECKER, color0=tuple(even), color1=tuple(odd), scale=scale
        )

    @staticmethod
    def image(path):
        return TextureSpec(kind=TEX_IMAGE, image_path=str(path))

    @staticmethod
    def noise(scale):
        return TextureSpec(kind=TEX_NOISE, scale=scale)


def _resolve_image_path(path: str):
    """The reference loader's search order (rtw_stb_image.h:28-36):
    $RTW_IMAGES/<name> first, then the literal path (cwd-relative), then
    images/<name>.  Returns the first existing candidate, else None."""
    import os

    candidates = []
    env_dir = os.environ.get("RTW_IMAGES", "")
    if env_dir:
        candidates.append(os.path.join(env_dir, os.path.basename(path)))
    candidates.append(path)
    candidates.append(os.path.join("images", os.path.basename(path)))
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def _load_image(path: str) -> np.ndarray:
    """Decode to [H,W,3] float 0..255; magenta 1x1 on failure
    (rtw_stb_image.h:44-67 semantics), with the reference's
    $RTW_IMAGES/cwd/images/ search path (rtw_stb_image.h:28-36)."""
    try:
        from PIL import Image

        resolved = _resolve_image_path(str(path))
        if resolved is None:
            raise FileNotFoundError(path)
        with Image.open(resolved) as im:
            arr = np.asarray(im.convert("RGB"), dtype=np.float64)
        if arr.size == 0:
            raise ValueError("empty image")
        return arr
    except Exception:
        return _MAGENTA.reshape(1, 1, 3)


def _build_perlin(seed: int = 0):
    """Reference perlin construction (perlin.h:6-14, 75-92): 256 unit vectors
    from normalized cube samples + three independent permutations."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(-1.0, 1.0, size=(256, 3))
    norms = np.linalg.norm(v, axis=-1, keepdims=True)
    norms[norms == 0] = 1.0
    randvec = v / norms
    perms = np.stack([rng.permutation(256) for _ in range(3)]).astype(np.int32)
    return randvec, perms


def build_texture_table(specs, dtype=np.float32, perlin_seed: int = 0) -> TextureTable:
    """Flatten TextureSpecs (may be empty) into a TextureTable."""
    if not specs:
        specs = [TextureSpec.solid((0.0, 0.0, 0.0))]

    kinds = np.array([s.kind for s in specs], np.int32)
    c0 = np.array([s.color0 for s in specs], np.float64)
    c1 = np.array([s.color1 for s in specs], np.float64)
    scale = np.array([s.scale for s in specs], np.float64)

    images, img_ids = [], []
    for s in specs:
        if s.kind == TEX_IMAGE:
            img_ids.append(len(images))
            images.append(_load_image(s.image_path))
        else:
            img_ids.append(0)
    if not images:
        images = [np.zeros((1, 1, 3))]

    hmax = max(im.shape[0] for im in images)
    wmax = max(im.shape[1] for im in images)
    atlas = np.zeros((len(images), hmax, wmax, 3))
    img_h = np.zeros((len(images),), np.int32)
    img_w = np.zeros((len(images),), np.int32)
    for i, im in enumerate(images):
        atlas[i, : im.shape[0], : im.shape[1]] = im
        img_h[i], img_w[i] = im.shape[0], im.shape[1]

    randvec, perms = _build_perlin(perlin_seed)

    return TextureTable(
        kind=jnp.asarray(kinds),
        color0=jnp.asarray(c0, dtype),
        color1=jnp.asarray(c1, dtype),
        scale=jnp.asarray(scale, dtype),
        img_id=jnp.asarray(img_ids, jnp.int32),
        images=jnp.asarray(atlas, dtype),
        img_h=jnp.asarray(img_h),
        img_w=jnp.asarray(img_w),
        perlin_randvec=jnp.asarray(randvec, dtype),
        perlin_perm=jnp.asarray(perms),
    )


# ---------------------------------------------------------------- device eval


def _perlin_noise(tt: TextureTable, p):
    """perlin::noise (perlin.h:16-36): smoothstep trilinear interpolation of
    dotted lattice gradients. p: [N,3] -> [N]."""
    pf = jnp.floor(p)
    uvw = p - pf
    ijk = pf.astype(jnp.int32)

    uu = uvw * uvw * (3.0 - 2.0 * uvw)  # [N,3]

    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                xi = (ijk[..., 0] + di) & 255
                yj = (ijk[..., 1] + dj) & 255
                zk = (ijk[..., 2] + dk) & 255
                h = (
                    tt.perlin_perm[0, xi]
                    ^ tt.perlin_perm[1, yj]
                    ^ tt.perlin_perm[2, zk]
                )
                c = tt.perlin_randvec[h]  # [N,3]
                weight_v = uvw - jnp.array([di, dj, dk], p.dtype)
                w = (
                    (di * uu[..., 0] + (1 - di) * (1 - uu[..., 0]))
                    * (dj * uu[..., 1] + (1 - dj) * (1 - uu[..., 1]))
                    * (dk * uu[..., 2] + (1 - dk) * (1 - uu[..., 2]))
                )
                accum = accum + w * jnp.sum(c * weight_v, axis=-1)
    return accum


def _perlin_turb(tt: TextureTable, p, depth: int = 7):
    """perlin::turb (perlin.h:38-50)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    temp_p = p
    weight = 1.0
    for _ in range(depth):
        accum = accum + weight * _perlin_noise(tt, temp_p)
        weight = weight * 0.5
        temp_p = temp_p * 2.0
    return jnp.abs(accum)


def texture_value(tt: TextureTable, tex_id, u, v, p, with_noise: bool = True):
    """Batched texture::value dispatch. tex_id [N] >= 0; returns [N,3].

    ``with_noise`` must be a static bool (perlin eval is costly; scene
    metadata gates it out when no noise textures exist).
    """
    kind = tt.kind[tex_id]
    c0 = tt.color0[tex_id]
    c1 = tt.color1[tex_id]
    scale = tt.scale[tex_id]

    # solid (texture.h:20-22)
    out = c0

    # checker (texture.h:37-46): integer-floor parity in world space
    inv_scale = jnp.where(scale != 0, 1.0 / scale, 0.0)
    fl = jnp.floor(inv_scale[..., None] * p).astype(jnp.int32)
    is_even = (fl[..., 0] + fl[..., 1] + fl[..., 2]) % 2 == 0
    checker = jnp.where(is_even[..., None], c0, c1)
    out = jnp.where((kind == TEX_CHECKER)[..., None], checker, out)

    # image (texture.h:57-73): clamp uv, flip v, nearest-neighbor, /255
    iid = tt.img_id[tex_id]
    w_img = tt.img_w[iid]
    h_img = tt.img_h[iid]
    uc = jnp.clip(u, 0.0, 1.0)
    vc = 1.0 - jnp.clip(v, 0.0, 1.0)
    xi = jnp.clip((uc * w_img).astype(jnp.int32), 0, w_img - 1)
    yj = jnp.clip((vc * h_img).astype(jnp.int32), 0, h_img - 1)
    texel = tt.images[iid, yj, xi] * (1.0 / 255.0)
    out = jnp.where((kind == TEX_IMAGE)[..., None], texel, out)

    # noise (texture.h:82-84): 0.5*(1+sin(scale*z + 10*turb(p,7)))
    if with_noise:
        turb = _perlin_turb(tt, p, 7)
        noise = 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turb))
        out = jnp.where((kind == TEX_NOISE)[..., None], noise[..., None], out)

    return out
