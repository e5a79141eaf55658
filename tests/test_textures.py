"""Texture system tests: solid/checker/image/noise eval semantics, sphere
UVs, and the earth scene end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from bpt_tpu.scene.builder import MaterialSpec, SceneBuilder
from bpt_tpu.scene.textures import TextureSpec, build_texture_table, texture_value
from bpt_tpu.scene.types import TEX_CHECKER, TEX_IMAGE, TEX_NOISE, TEX_SOLID


def _val(tt, tid, u, v, p, with_noise=True):
    return np.asarray(
        texture_value(
            tt,
            jnp.full((len(u),), tid, jnp.int32),
            jnp.asarray(u, jnp.float64),
            jnp.asarray(v, jnp.float64),
            jnp.asarray(p, jnp.float64),
            with_noise=with_noise,
        )
    )


def test_solid():
    tt = build_texture_table([TextureSpec.solid((0.1, 0.2, 0.3))], dtype=np.float64)
    out = _val(tt, 0, [0.5], [0.5], [[1, 2, 3]])
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.3])


def test_checker_parity():
    # integer-floor parity in world space (texture.h:37-46)
    tt = build_texture_table(
        [TextureSpec.checker(1.0, (1, 1, 1), (0, 0, 0))], dtype=np.float64
    )
    out = _val(tt, 0, [0, 0, 0], [0, 0, 0],
               [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [1.5, 1.5, 0.5]])
    np.testing.assert_allclose(out[:, 0], [1.0, 0.0, 1.0])  # even, odd, even


def test_image_nearest_and_vflip(tmp_path):
    from PIL import Image

    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = [255, 0, 0]  # top-left red
    img[1, 1] = [0, 0, 255]  # bottom-right blue
    p = tmp_path / "t.png"
    Image.fromarray(img).save(p)
    tt = build_texture_table([TextureSpec.image(str(p))], dtype=np.float64)
    # v=1 -> image row 0 (flip, texture.h:61); u=0 -> col 0
    out = _val(tt, 0, [0.1, 0.9], [0.9, 0.1], [[0, 0, 0], [0, 0, 0]])
    np.testing.assert_allclose(out[0], [1, 0, 0])
    np.testing.assert_allclose(out[1], [0, 0, 1])


def test_image_missing_gives_magenta_fallback():
    tt = build_texture_table([TextureSpec.image("/nope/missing.png")], dtype=np.float64)
    out = _val(tt, 0, [0.5], [0.5], [[0, 0, 0]])
    np.testing.assert_allclose(out[0], [1.0, 0.0, 1.0])  # rtw_stb_image.h:63-67


def test_image_search_path_env_and_images_dir(tmp_path, monkeypatch):
    """rtw_stb_image.h:28-36 search order: $RTW_IMAGES/<name>, then the
    literal (cwd-relative) path, then images/<name>."""
    from PIL import Image

    from bpt_tpu.scene.textures import _load_image

    red = np.zeros((1, 1, 3), np.uint8)
    red[0, 0] = [255, 0, 0]
    blue = np.zeros((1, 1, 3), np.uint8)
    blue[0, 0] = [0, 0, 255]

    env_dir = tmp_path / "envdir"
    env_dir.mkdir()
    Image.fromarray(red).save(env_dir / "tex.png")

    cwd = tmp_path / "cwd"
    (cwd / "images").mkdir(parents=True)
    Image.fromarray(blue).save(cwd / "images" / "tex.png")
    monkeypatch.chdir(cwd)

    # $RTW_IMAGES wins over images/
    monkeypatch.setenv("RTW_IMAGES", str(env_dir))
    np.testing.assert_allclose(_load_image("tex.png")[0, 0], [255, 0, 0])
    # without the env var, the literal path misses -> images/<name>
    monkeypatch.delenv("RTW_IMAGES")
    np.testing.assert_allclose(_load_image("tex.png")[0, 0], [0, 0, 255])
    # a resolvable literal path still wins over images/
    Image.fromarray(red).save(cwd / "tex.png")
    np.testing.assert_allclose(_load_image("tex.png")[0, 0], [255, 0, 0])


def test_noise_range():
    tt = build_texture_table([TextureSpec.noise(2.0)], dtype=np.float64)
    rng = np.random.default_rng(0)
    p = rng.uniform(-5, 5, (100, 3))
    out = _val(tt, 0, np.zeros(100), np.zeros(100), p)
    assert (out >= 0).all() and (out <= 1).all()
    assert out.std() > 0.05  # actually varies


def test_sphere_uvs_interpolate():
    """Hit (u,v) on a tessellated sphere are spherical UVs, while plain
    triangles keep barycentric passthrough."""
    from bpt_tpu.core import vec3 as v3
    from bpt_tpu.ops import soa

    b = SceneBuilder()
    tex = TextureSpec.solid((1, 1, 1))
    b.add_uv_sphere((0, 0, 0), 1.0, MaterialSpec.lambertian((1, 1, 1), texture=tex))
    scene = b.build(dtype=jnp.float64, light_fallback_to_world=False)
    assert scene.has_textures

    # ray hitting the sphere from +x: expect u ~ 0 (phi=0), v ~ 0.5 (equator)
    o = v3.from_array(jnp.asarray([[5.0, 0.0, 0.0]], jnp.float64))
    d = v3.from_array(jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float64))
    h = soa.closest_hit(scene, o, d, 1e-3, jnp.inf)
    rec = soa.complete_hit(scene, o, d, h)
    assert bool(np.asarray(rec.hit)[0])
    u = float(np.asarray(rec.u)[0])
    v = float(np.asarray(rec.v)[0])
    assert u < 0.05 or u > 0.95  # phi ~ 0 (wraps)
    assert abs(v - 0.5) < 0.05

    # ray from +z: phi = pi/2 -> u ~ 0.25, equator -> v ~ 0.5.
    # (Pole probes are useless: the reference's cap quads degenerate to
    # zero-area slivers, leaving literal holes at both poles — faithfully
    # replicated here, scene_loader.h:223-241.)
    o2 = v3.from_array(jnp.asarray([[0.0, 0.0, 5.0]], jnp.float64))
    d2 = v3.from_array(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64))
    h2 = soa.closest_hit(scene, o2, d2, 1e-3, jnp.inf)
    rec2 = soa.complete_hit(scene, o2, d2, h2)
    assert abs(float(np.asarray(rec2.u)[0]) - 0.25) < 0.05
    assert abs(float(np.asarray(rec2.v)[0]) - 0.5) < 0.05


def test_plain_triangle_uv_is_barycentric():
    from bpt_tpu.core import vec3 as v3
    from bpt_tpu.ops import soa

    b = SceneBuilder()
    tex = TextureSpec.solid((1, 1, 1))
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0),
                   MaterialSpec.lambertian((1, 1, 1), texture=tex))
    scene = b.build(dtype=jnp.float64, light_fallback_to_world=False)
    o = v3.from_array(jnp.asarray([[0.25, 0.5, 1.0]], jnp.float64))
    d = v3.from_array(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64))
    h = soa.closest_hit(scene, o, d, 1e-3, jnp.inf)
    rec = soa.complete_hit(scene, o, d, h)
    assert np.isclose(float(np.asarray(rec.u)[0]), 0.25)
    assert np.isclose(float(np.asarray(rec.v)[0]), 0.5)


def test_earth_scene_loads_and_has_image():
    from bpt_tpu.scene.loader import load_scene_from_yaml

    loaded = load_scene_from_yaml(
        "scenes/earth.yaml", dtype=jnp.float32, verbose=False,
        camera_overrides=dict(image_width=8, aspect_ratio=1.0),
    )
    s = loaded.scene
    assert s.has_textures
    # the earthmap atlas actually loaded (not the 1x1 magenta fallback)
    assert int(s.textures.img_w.max()) == 1024
