"""Texture evaluation semantics vs closed forms (textures/*.rs)."""

import numpy as np

from hyper_ray_tracer_tpu.models.builders import _CAM_STANDARD
from hyper_ray_tracer_tpu.models.scene import SceneBuilder
from hyper_ray_tracer_tpu.ops import perlin
from hyper_ray_tracer_tpu.ops.textures import texture_value


def _scene(add_texs):
    b = SceneBuilder()
    tex_ids = add_texs(b)
    mat = b.lambertian(tex_ids[0])
    b.sphere((0.0, 0.0, 0.0), 1.0, mat)
    return b.finalize(_CAM_STANDARD, (0, 0, 0), "textest"), tex_ids


def _value(scene, tex_ids, u, v, point):
    a = scene.arrays
    n = len(point)
    return texture_value(
        a.textures, a.images, a.image_wh, a.perlin,
        np.full(n, tex_ids[0], np.int32), np.asarray(u, np.float32),
        np.asarray(v, np.float32), np.asarray(point, np.float32),
        scene.static, np,
    )


def test_solid_color():
    scene, ids = _scene(lambda b: [b.solid((0.1, 0.2, 0.3))])
    val = _value(scene, ids, [0.0], [0.0], [[5.0, -2.0, 7.0]])
    np.testing.assert_allclose(val, [[0.1, 0.2, 0.3]])


def test_checker_sign():
    """checker_texture.rs:22-30: sin(10x)sin(10y)sin(10z) < 0 -> odd."""
    scene, ids = _scene(
        lambda b: [b.checker((1.0, 0.0, 0.0), (0.0, 1.0, 0.0))])
    q = np.pi / 20.0  # sin(10q) = 1
    pts = [[q, q, q],     # product +1 -> even (green)
           [-q, q, q],    # product -1 -> odd (red)
           [-q, -q, q],   # product +1 -> even
           [-q, -q, -q]]  # product -1 -> odd
    val = _value(scene, ids, [0.0] * 4, [0.0] * 4, pts)
    np.testing.assert_allclose(
        val, [[0, 1, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0]], atol=1e-6)


def test_noise_marble_formula():
    """noise_texture.rs:25-31 with the pre-scaled turbulence input quirk."""
    scene, ids = _scene(lambda b: [b.noise(4.0)])
    pts = np.random.default_rng(0).uniform(-2, 2, (50, 3)).astype(np.float32)
    val = _value(scene, ids, np.zeros(50), np.zeros(50), pts)
    sp = 4.0 * pts
    turb = perlin.turbulence(scene.arrays.perlin, sp, np)
    marble = 0.5 * (1.0 + np.sin(sp[:, 2] + 10.0 * turb))
    np.testing.assert_allclose(val, np.stack([marble] * 3, -1), atol=1e-5)
    assert (val >= 0.0).all() and (val <= 1.0).all()


def test_image_nearest_lookup_and_v_flip():
    """image_texture.rs:41-53: u clamped, v flipped, nearest texel."""
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)  # top-left
    img[0, 1] = (0, 1, 0)  # top-right
    img[1, 0] = (0, 0, 1)  # bottom-left
    img[1, 1] = (1, 1, 0)  # bottom-right
    scene, ids = _scene(lambda b: [b.image(img)])
    # v = 1 maps to row 0 (flip); u = 0 -> col 0.
    val = _value(scene, ids, [0.0, 0.9, 0.0, 0.9], [0.9, 0.9, 0.1, 0.1],
                 [[0, 0, 0]] * 4)
    np.testing.assert_allclose(
        val, [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]])
    # Out-of-range u/v clamp to the edge texels (u=1 -> last column).
    val = _value(scene, ids, [1.0, -0.5], [1.0, -0.5], [[0, 0, 0]] * 2)
    np.testing.assert_allclose(val, [[0, 1, 0], [0, 0, 1]])
