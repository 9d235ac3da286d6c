"""PT_BOX (solid cuboid slab primitive) vs the reference's 6-rect List.

The reference decomposes a cuboid into 6 axis-aligned rects scanned
linearly (cuboid.rs:31-88 + list.rs:20-31); the TPU build intersects ONE
slab interval (ops/intersect.py box_t) because a convex box's valid face
hits are exactly the interval endpoints.  These tests prove the
equivalence against a literal 6-rect build (SceneBuilder.cuboid_rects,
kept for exactly this purpose) at three levels: raw hit distances,
hit details (normal/uv/front_face), and full renders.
"""

import numpy as np
import pytest

from hyper_ray_tracer_tpu.models.scene import (
    CameraConfig,
    SceneBuilder,
    rotation_matrix,
)
from hyper_ray_tracer_tpu.ops.intersect import (
    BIG,
    gather_prim,
    make_hit_detailer,
    make_prim_intersector,
)
from hyper_ray_tracer_tpu.render import RenderSettings, render_image

CAM = CameraConfig(look_from=(278, 278, -800), look_at=(278, 278, 0),
                   fov=40.0, aperture=0.0)


def _scene(use_box: bool, rot=None, trans=None):
    b = SceneBuilder()
    white = b.lambertian(b.solid((0.73, 0.73, 0.73)))
    red = b.lambertian(b.solid((0.65, 0.05, 0.05)))
    light = b.diffuse_light(b.solid((7.0, 7.0, 7.0)))
    add = b.cuboid if use_box else b.cuboid_rects
    add((100, 0, 100), (260, 180, 260), white, rot=rot, trans=trans)
    add((300, 0, 150), (420, 90, 300), red, rot=rot, trans=trans)
    b.rect(2, 113, 443, 127, 432, 554, light)  # ZX ceiling light
    b.sphere((278, 350, 200), 60.0, white)
    return b.finalize(CAM, (0.0, 0.0, 0.0), "box-eq")


def _rand_rays(n, rng, inside_box=None):
    """Rays with origins outside (default) or inside a given box."""
    if inside_box is None:
        o = rng.uniform(-200, 700, (n, 3)).astype(np.float32)
    else:
        mn, mx = inside_box
        o = rng.uniform(mn, mx, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    # Mix in axis-parallel rays (two zero components) — the rect path
    # rejects parallel faces explicitly, the slab path floors d.
    k = n // 4
    axis = rng.integers(0, 3, k)
    d_par = np.zeros((k, 3), np.float32)
    d_par[np.arange(k), axis] = rng.choice([-1.0, 1.0], k)
    d[:k] = d_par
    return o, d


def _closest(scene, o, d):
    """Dense closest-hit over all prims of a scene, NumPy path."""
    g = scene.arrays.geom
    n = scene.static.n_prims
    pf = gather_prim(g, np.arange(n))
    hit_t = make_prim_intersector(scene.static)
    t = hit_t(pf, o[:, None, :], d[:, None, :],
              np.zeros((o.shape[0], 1), np.float32),
              np.float32(1e-3), np.float32(BIG),
              np.zeros((o.shape[0], 1), np.uint32), np)
    best = np.argmin(t, axis=1)
    return t.min(axis=1), best


@pytest.mark.parametrize("rot,trans", [
    (None, None),
    (rotation_matrix(1, 15.0), (30.0, 0.0, 50.0)),
])
def test_box_hit_t_matches_six_rects(rot, trans):
    sa = _scene(True, rot, trans)
    sb = _scene(False, rot, trans)
    rng = np.random.default_rng(7)
    o1, d1 = _rand_rays(512, rng)
    o2, d2 = _rand_rays(256, rng, inside_box=((110, 10, 110),
                                              (250, 170, 250)))
    o = np.concatenate([o1, o2])
    d = np.concatenate([d1, d2])
    ta, _ = _closest(sa, o, d)
    tb, _ = _closest(sb, o, d)
    miss_a = ta >= 0.5 * BIG
    miss_b = tb >= 0.5 * BIG
    np.testing.assert_array_equal(miss_a, miss_b)
    hit = ~miss_a
    np.testing.assert_allclose(ta[hit], tb[hit], rtol=2e-5, atol=2e-3)


def test_box_detail_matches_six_rects():
    """Normal, front_face, and uv of box hits reproduce the face rect's."""
    sa = _scene(True)
    sb = _scene(False)
    rng = np.random.default_rng(11)
    o, d = _rand_rays(768, rng)
    time = np.zeros((o.shape[0],), np.float32)

    ta, ba = _closest(sa, o, d)
    tb, bb_ = _closest(sb, o, d)
    hit = ta < 0.5 * BIG

    det_a = make_hit_detailer(sa.static)(
        gather_prim(sa.arrays.geom, ba), o, d, time, ta, np)
    det_b = make_hit_detailer(sb.static)(
        gather_prim(sb.arrays.geom, bb_), o, d, time, tb, np)
    np.testing.assert_allclose(det_a.normal[hit], det_b.normal[hit],
                               atol=1e-5)
    np.testing.assert_array_equal(det_a.front_face[hit],
                                  det_b.front_face[hit])
    np.testing.assert_allclose(det_a.u[hit], det_b.u[hit], atol=1e-4)
    np.testing.assert_allclose(det_a.v[hit], det_b.v[hit], atol=1e-4)
    np.testing.assert_allclose(det_a.point[hit], det_b.point[hit],
                               atol=2e-3)


def test_box_render_matches_six_rects():
    """Full wavefront render: box scene == rect scene up to float
    round-off (the RNG streams are pixel-keyed, not primitive-keyed, so
    identical hits give identical paths)."""
    s = dict(width=64, height=36, samples=4, depth=5)
    img_a = render_image(_scene(True), RenderSettings(**s))
    img_b = render_image(_scene(False), RenderSettings(**s))
    err = np.abs(img_a - img_b)
    assert float(np.median(err)) < 1e-5, np.median(err)
    assert float(err.mean()) < 2e-3, err.mean()
    assert float(np.mean(err.max(-1) > 3e-2)) < 0.02


def test_box_render_matches_six_rects_rotated():
    s = dict(width=48, height=27, samples=4, depth=4)
    rot = rotation_matrix(1, -18.0)
    img_a = render_image(_scene(True, rot, (40, 0, 0)), RenderSettings(**s))
    img_b = render_image(_scene(False, rot, (40, 0, 0)), RenderSettings(**s))
    err = np.abs(img_a - img_b)
    assert float(np.median(err)) < 1e-5, np.median(err)
    assert float(err.mean()) < 2e-3, err.mean()


def test_box_gradients_finite():
    """Gradients flow through box bounds (slab math is min/max of linear
    terms — subgradients everywhere) without NaN on masked lanes.

    Solid-color lambertians give a correctly-zero a.e. geometry gradient
    (radiance depends on geometry only through discrete path decisions),
    so the boxes here wear a NOISE texture: the hit POINT feeds the
    texture value continuously, and the point depends on the box bounds
    through the recomputed slab t.
    """
    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import make_ray_colorer, prepare_scene

    W, H, D = 32, 18, 3
    b = SceneBuilder()
    marble = b.lambertian(b.noise(0.05))
    b.cuboid((100, 0, 100), (260, 180, 260), marble)
    b.cuboid((300, 0, 150), (420, 90, 300), marble)
    # Sky background: every box hit scatters and (mostly) escapes, so the
    # path radiance is bg * noise(point) — continuously dependent on the
    # box bounds through the slab t.
    scene = b.finalize(CAM, (0.7, 0.8, 1.0), "box-grad")
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    rc = make_ray_colorer(scene, W, H, D, mode)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    sam = jnp.zeros(W * H, jnp.int32)

    def loss(p0, p1):
        g = arrays.geom._replace(p0=p0, p1=p1)
        a = arrays._replace(geom=g)
        return rc(a, bvh, basis, pix, sam, np.uint32(0)).mean()

    g0, g1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        arrays.geom.p0, arrays.geom.p1)
    assert np.isfinite(np.asarray(g0)).all()
    assert np.isfinite(np.asarray(g1)).all()
    assert np.abs(np.asarray(g0)).max() > 0.0
