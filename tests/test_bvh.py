"""Flattened BVH: structural invariants + traversal == linear scan."""

import jax
import jax.numpy as jnp
import numpy as np

from hyper_ray_tracer_tpu.models.bvh_build import build_bvh
from hyper_ray_tracer_tpu.models.scene import (
    PLANE_XY,
    PLANE_ZX,
    PT_NONE,
    CameraConfig,
    SceneBuilder,
)
from hyper_ray_tracer_tpu.ops.bvh import (
    make_bvh_traverser,
    make_scan_intersector,
)

CAM = CameraConfig((0, 0, 0), (0, 0, -1), 90.0, 0.0)


def _soup_scene(n_spheres=60, with_rects=True, with_media=True, seed=0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.lambertian(b.solid((0.5, 0.5, 0.5)))
    for _ in range(n_spheres):
        c = rng.uniform(-10, 10, 3)
        b.sphere(c, rng.uniform(0.2, 1.5), mat)
    if with_rects:
        for _ in range(10):
            a0, b0 = rng.uniform(-10, 0, 2)
            b.rect(PLANE_XY, a0, a0 + rng.uniform(1, 5), b0,
                   b0 + rng.uniform(1, 5), rng.uniform(-10, 10), mat)
            b.rect(PLANE_ZX, a0, a0 + rng.uniform(1, 5), b0,
                   b0 + rng.uniform(1, 5), rng.uniform(-10, 10), mat)
    if with_media:
        tex = b.solid((1, 1, 1))
        b.medium_sphere(rng.uniform(-5, 5, 3), 2.0, 0.5, tex)
        b.medium_box(rng.uniform(-8, -4, 3), rng.uniform(2, 8, 3), 0.3, tex)
    return b.finalize(CAM, (0, 0, 0), "soup")


def _random_rays(n, seed):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    time = rng.random(n).astype(np.float32)
    bits = rng.integers(0, 2**32, n, dtype=np.uint32)
    return o, d, time, bits


def test_bvh_structure():
    scene = _soup_scene()
    for leaf_size in (1, 4, 8):
        bvh, geom = build_bvh(scene.arrays.geom, leaf_size=leaf_size)
        nn = bvh.skip.shape[0]
        n = scene.static.n_prims
        # Every real prim appears exactly once across leaves.
        covered = []
        for i in range(nn):
            assert bvh.skip[i] > i  # monotone DFS threading
            if bvh.leaf_first[i] >= 0:
                assert 1 <= bvh.leaf_count[i] <= leaf_size
                covered.extend(
                    range(bvh.leaf_first[i],
                          bvh.leaf_first[i] + bvh.leaf_count[i])
                )
        assert sorted(covered) == list(range(n))
        # Node bounds contain their leaf prims' AABBs.
        for i in range(nn):
            if bvh.leaf_first[i] >= 0:
                sl = slice(bvh.leaf_first[i],
                           bvh.leaf_first[i] + bvh.leaf_count[i])
                assert (geom.aabb_min[sl] >= bvh.bounds_min[i] - 1e-4).all()
                assert (geom.aabb_max[sl] <= bvh.bounds_max[i] + 1e-4).all()
        # Root bounds contain everything real.
        real = np.asarray(geom.ptype) != PT_NONE
        assert (geom.aabb_min[real] >= bvh.bounds_min[0] - 1e-4).all()
        assert (geom.aabb_max[real] <= bvh.bounds_max[0] + 1e-4).all()


def test_traversal_matches_scan():
    scene = _soup_scene()
    o, d, time, bits = _random_rays(2000, 1)
    active = np.ones(len(o), bool)
    active[::17] = False  # exercise the dead-ray path

    scan = make_scan_intersector(scene.static)
    for leaf_size in (1, 4):
        bvh, geom = build_bvh(scene.arrays.geom, leaf_size=leaf_size)
        trav = make_bvh_traverser(scene.static, leaf_size)
        t_s, i_s = jax.jit(scan)(geom, o, d, time, np.float32(1e-3),
                                 bits, active)
        t_b, i_b = jax.jit(trav)(bvh, geom, o, d, time, np.float32(1e-3),
                                 bits, active)
        np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_b),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_b))


def test_traversal_matches_scan_sphere_only():
    scene = _soup_scene(n_spheres=200, with_rects=False, with_media=False,
                        seed=3)
    o, d, time, bits = _random_rays(1000, 2)
    active = np.ones(len(o), bool)
    scan = make_scan_intersector(scene.static)
    bvh, geom = build_bvh(scene.arrays.geom, leaf_size=4)
    trav = make_bvh_traverser(scene.static, 4)
    t_s, i_s = jax.jit(scan)(geom, o, d, time, np.float32(1e-3), bits, active)
    t_b, i_b = jax.jit(trav)(bvh, geom, o, d, time, np.float32(1e-3), bits,
                             active)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_b), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_b))


def test_native_builder_matches_numpy():
    import pytest

    from hyper_ray_tracer_tpu.models.bvh_build import _build_numpy
    from hyper_ray_tracer_tpu.utils.native import (
        native_available,
        native_build_bvh,
    )

    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    n = 500
    amin = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    amax = amin + rng.uniform(0.1, 3, (n, 3)).astype(np.float32)
    for leaf in (1, 4, 8):
        a = _build_numpy(amin, amax, leaf)
        b = native_build_bvh(amin, amax, leaf)
        for x, y, name in zip(a, b, ["bmin", "bmax", "first", "count",
                                     "skip", "perm"]):
            np.testing.assert_array_equal(x, y), (leaf, name)


def test_tile_plan_runs_and_fallback():
    """Run-aligned tile planning: type/axis-pure runs, exact coverage,
    and the uniform-tile fallback past MAX_PLAN_TILES runs."""
    import numpy as np

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.ops.bvh import (
        MAX_PLAN_TILES,
        SCAN_TILE,
        _tile_plan,
        make_scan_intersector,
    )

    scene = build_scene("final")
    g = scene.arrays.geom
    n = scene.static.n_prims
    plan = _tile_plan(g, n, SCAN_TILE)

    # Exact, ordered, gap-free coverage of [0, n).
    pos = 0
    for start, width, types, motion, xform, rect_axis in plan:
        assert start == pos and width > 0
        pos += width
        assert len(types) == 1  # runs are type-pure on this scene
        if rect_axis is not None:
            assert np.unique(
                np.asarray(g.axis)[start:start + width]).tolist() \
                == [rect_axis]
    assert pos == n
    assert len(plan) <= MAX_PLAN_TILES

    # A pathological alternating layout falls back to the generic sweep.
    import hyper_ray_tracer_tpu.models.scene as S
    alt = g._replace(ptype=np.where(
        np.arange(g.ptype.shape[0]) % 2 == 0, S.PT_SPHERE, S.PT_RECT
    ).astype(np.int32))
    many = _tile_plan(alt, n, SCAN_TILE)
    assert len(many) > MAX_PLAN_TILES  # would fall back in the intersector
