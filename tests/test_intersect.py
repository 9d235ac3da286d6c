"""Primitive intersection vs hand-computed closed forms."""

import numpy as np

from hyper_ray_tracer_tpu.models.scene import (
    PLANE_XY,
    CameraConfig,
    SceneBuilder,
)
from hyper_ray_tracer_tpu.ops.intersect import (
    BIG,
    aabb_hit,
    gather_prim,
    make_hit_detailer,
    make_prim_intersector,
)

CAM = CameraConfig((0, 0, 0), (0, 0, -1), 90.0, 0.0)


def _scene(build):
    b = SceneBuilder()
    build(b)
    return b.finalize(CAM, (0, 0, 0), "t")


def _hit_all(scene, o, d, time=0.0, t_min=1e-3, t_max=float(BIG)):
    geom = scene.arrays.geom
    hit_t = make_prim_intersector(scene.static)
    n = scene.static.n_prims
    o = np.asarray(o, np.float32)[None]
    d = np.asarray(d, np.float32)[None]
    best_t, best = np.float32(t_max), -1
    for i in range(n):
        pf = gather_prim(geom, np.array([i]))
        t = hit_t(pf, o, d, np.float32([time]), np.float32(t_min),
                  best_t, np.uint32([1234]), np)[0]
        if t < best_t:
            best_t, best = t, i
    return float(best_t), best


def test_sphere_front_hit():
    s = _scene(lambda b: b.sphere((0, 0, -5), 1.0, b.lambertian(b.solid((1, 1, 1)))))
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    assert i == 0 and abs(t - 4.0) < 1e-5


def test_sphere_behind_misses():
    s = _scene(lambda b: b.sphere((0, 0, 5), 1.0, b.lambertian(b.solid((1, 1, 1)))))
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    assert i == -1


def test_sphere_inside_far_root():
    s = _scene(lambda b: b.sphere((0, 0, 0), 1.0, b.lambertian(b.solid((1, 1, 1)))))
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    assert i == 0 and abs(t - 1.0) < 1e-5


def test_moving_sphere_center_lerp():
    def build(b):
        b.moving_sphere((0, 0, -5), (2, 0, -5), 0.0, 1.0, 0.5,
                        b.lambertian(b.solid((1, 1, 1))))

    s = _scene(build)
    t0, i0 = _hit_all(s, (0, 0, 0), (0, 0, -1), time=0.0)
    assert i0 == 0 and abs(t0 - 4.5) < 1e-5
    t1, i1 = _hit_all(s, (0, 0, 0), (0, 0, -1), time=1.0)
    assert i1 == -1  # moved out of the ray at shutter close
    t2, i2 = _hit_all(s, (2, 0, 0), (0, 0, -1), time=1.0)
    assert i2 == 0 and abs(t2 - 4.5) < 1e-5


def test_rect_hit_uv_and_t():
    def build(b):
        b.rect(PLANE_XY, -1.0, 1.0, -1.0, 1.0, -2.0,
               b.lambertian(b.solid((1, 1, 1))))

    s = _scene(build)
    t, i = _hit_all(s, (0.5, -0.5, 0), (0, 0, -1))
    assert i == 0 and abs(t - 2.0) < 1e-5
    det = make_hit_detailer(s.static)
    pf = gather_prim(s.arrays.geom, np.array([0]))
    h = det(pf, np.float32([[0.5, -0.5, 0]]), np.float32([[0, 0, -1]]),
            np.float32([0.0]), np.float32([t]), np)
    assert abs(h.u[0] - 0.75) < 1e-5 and abs(h.v[0] - 0.25) < 1e-5
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-6)
    assert bool(h.front_face[0])


def test_rect_parallel_ray_misses():
    def build(b):
        b.rect(PLANE_XY, -1.0, 1.0, -1.0, 1.0, -2.0,
               b.lambertian(b.solid((1, 1, 1))))

    s = _scene(build)
    t, i = _hit_all(s, (0, 0, 0), (1, 0, 0))
    assert i == -1


def test_rotated_rect():
    """Rect in XY at k=0 spanning [-1,1]^2, rotated 90 deg about Y -> lies in
    the YZ plane at x=0; a +x ray from (-3, 0.2, 0.3) hits it at t=3."""
    from hyper_ray_tracer_tpu.models.scene import rotation_matrix

    def build(b):
        b.rect(PLANE_XY, -1.0, 1.0, -1.0, 1.0, 0.0,
               b.lambertian(b.solid((1, 1, 1))),
               rot=rotation_matrix(1, 90.0))

    s = _scene(build)
    assert s.static.has_ray_xform
    t, i = _hit_all(s, (-3, 0.2, 0.3), (1, 0, 0))
    assert i == 0 and abs(t - 3.0) < 1e-4


def test_translated_rect_folds():
    def build(b):
        b.rect(PLANE_XY, -1.0, 1.0, -1.0, 1.0, 0.0,
               b.lambertian(b.solid((1, 1, 1))), trans=(0.0, 0.0, -2.0))

    s = _scene(build)
    assert not s.static.has_ray_xform  # pure translation folded into params
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    assert i == 0 and abs(t - 2.0) < 1e-5


def test_sphere_transform_bakes():
    from hyper_ray_tracer_tpu.models.scene import rotation_matrix

    def build(b):
        b.sphere((1.0, 0.0, 0.0), 0.5, b.lambertian(b.solid((1, 1, 1))),
                 rot=rotation_matrix(1, 90.0), trans=(0.0, 2.0, 0.0))

    s = _scene(build)
    assert not s.static.has_ray_xform
    # R_y(90) @ (1,0,0) = (0,0,-1); + (0,2,0) -> center (0,2,-1).
    np.testing.assert_allclose(s.arrays.geom.p0[0], [0, 2, -1], atol=1e-6)


def test_medium_certain_scatter():
    """Huge density -> scatter essentially at entry."""
    def build(b):
        b.medium_sphere((0, 0, -5), 1.0, 1e6, b.solid((1, 1, 1)))

    s = _scene(build)
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    assert i == 0 and abs(t - 4.0) < 1e-3


def test_medium_zero_density_never_scatters():
    def build(b):
        b.medium_sphere((0, 0, -5), 1.0, 1e-12, b.solid((1, 1, 1)))

    s = _scene(build)
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    assert i == -1


def test_medium_box_inside_origin():
    def build(b):
        b.medium_box((-1, -1, -1), (1, 1, 1), 1e6, b.solid((1, 1, 1)))

    s = _scene(build)
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    # Entry clamped to t_min; certain scatter just past it.
    assert i == 0 and t < 0.01


def test_aabb_slab():
    o = np.float32([[-5, 0, 0]])
    d = np.float32([[1, 0, 0]])
    inv = 1.0 / d
    mn = np.float32([[-1, -1, -1]])
    mx = np.float32([[1, 1, 1]])
    assert aabb_hit(mn, mx, o, inv, np.float32(0.001), np.float32(100.0), np)[0]
    assert not aabb_hit(mn, mx, o, inv, np.float32(0.001), np.float32(3.9), np)[0]
    # Ray pointing away.
    assert not aabb_hit(mn, mx, o, -inv, np.float32(0.001), np.float32(100.0), np)[0]


def test_hollow_sphere_negative_radius_normal():
    def build(b):
        glass = b.dielectric(1.5)
        b.sphere((0, 0, -2), -0.5, glass)

    s = _scene(build)
    t, i = _hit_all(s, (0, 0, 0), (0, 0, -1))
    assert i == 0 and abs(t - 1.5) < 1e-5
    det = make_hit_detailer(s.static)
    pf = gather_prim(s.arrays.geom, np.array([0]))
    h = det(pf, np.float32([[0, 0, 0]]), np.float32([[0, 0, -1]]),
            np.float32([0.0]), np.float32([t]), np)
    # Negative radius flips the outward normal inward (hollow-glass trick):
    # outward = (p - c)/r = (0,0,0.5)/-0.5 = (0,0,-1); dot(d, outward) > 0
    # -> front_face False, normal flipped back to (0,0,1).
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-6)
