"""Film: sample accumulation and 8-bit conversion.

Matches colors_to_rgb8 (src/image/wpng.h:14-35) exactly: divide the pixel
sample *sum* by max(1, spp), clamp each channel to [0, 0.999], gamma-2 via
sqrt, scale by 256, truncate to uint8.  The reference lets NaN flow through
its clamp (wpng.h:10 — UB at the uint8 cast); we scrub NaN to 0 by default
behind a flag (the reference's unused PPM path, src/core/color.h:18-41, also
scrubs).
"""

from __future__ import annotations

import jax.numpy as jnp


def to_rgb8(framebuffer_sum, samples_per_pixel: int, nan_scrub: bool = True):
    """framebuffer_sum: [..., 3] sum of per-sample colors -> uint8 [..., 3]."""
    scale = 1.0 / max(1, int(samples_per_pixel))
    c = framebuffer_sum * scale
    if nan_scrub:
        c = jnp.nan_to_num(c, nan=0.0, posinf=jnp.inf, neginf=-jnp.inf)
    c = jnp.clip(c, 0.0, 0.999)
    c = jnp.sqrt(c)
    return (256.0 * c).astype(jnp.uint8)
