"""Differentiability: jax.grad vs central finite differences.

Covers every trainable parameter class from BASELINE.md: sphere centers and
radii, metal albedo/fuzz, dielectric IOR, texture colors, Perlin noise
scale, and image texels.  Gradients use the fixed-decision convention
(train.py docstring): checks run at configurations where the FD epsilon does
not flip any discrete decision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.render import prepare_scene
from hyper_ray_tracer_tpu.train import extract_params, make_loss_fn

W, H, SPP, DEPTH = 24, 14, 2, 4


def _setup(name, depth=DEPTH, pixel_mask=None):
    """Loss = masked MSE vs a constant target.

    ``pixel_mask`` ([W*H] bool) restricts the loss to pixels away from
    geometric silhouettes: with the fixed-decision gradient convention,
    finite differences only match where the epsilon flips no hit/miss
    decision (train.py docstring).
    """
    scene = build_scene(name)
    arrays, bvh, intersector = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))  # closure-captured below
    basis = make_basis(scene.camera, W, H)
    from hyper_ray_tracer_tpu.render import make_ray_colorer

    ray_color = make_ray_colorer(scene, W, H, depth, intersector)
    params0 = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    target = jnp.full((W * H, 3), 0.25, jnp.float32)
    mask = (jnp.ones(W * H, bool) if pixel_mask is None
            else jnp.asarray(pixel_mask))

    from hyper_ray_tracer_tpu.train import merge_params

    def loss_fn(p):
        a = merge_params(arrays, p)
        rad = ray_color(a, bvh, basis, pix.reshape(-1), sam.reshape(-1),
                        np.uint32(0))
        mean_rad = rad.reshape(SPP, W * H, 3).mean(0)
        err = ((mean_rad - target) ** 2).mean(-1)
        return jnp.where(mask, err, 0.0).sum() / mask.sum()

    f = jax.jit(loss_fn)
    g = jax.jit(jax.grad(loss_fn))
    return f, g, params0


def _fd_check(f, g, params, key, idx, eps, rtol, min_mag=1e-7):
    """Central finite difference on params[key][idx] (f64 accumulation)."""
    grads = g(params)
    gval = float(np.asarray(grads[key])[idx])

    def perturbed(delta):
        p = dict(params)
        arr = np.array(params[key], np.float32)
        arr[idx] += delta
        p[key] = jnp.asarray(arr)
        return float(f(p))

    fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
    assert abs(fd) > min_mag, f"FD degenerate for {key}[{idx}]: {fd}"
    assert np.isfinite(gval)
    np.testing.assert_allclose(gval, fd, rtol=rtol), (key, idx)


def _center_mask():
    """Pixels in the middle of the frame (on the r=0.5 sphere, away from its
    silhouette) for the one-sphere scene at 24x14."""
    m = np.zeros((H, W), bool)
    m[5:9, 9:15] = True
    return m.reshape(-1)


def test_sphere_center_grad():
    f, g, params = _setup("one-sphere")
    _fd_check(f, g, params, "geom.p0", (0, 1), 1e-3, 0.05)


def test_sphere_center_and_radius_grad_interior():
    # Masked to sphere-interior pixels: no silhouette decision can flip, so
    # FD matches the fixed-decision gradient even at larger epsilon.
    f, g, params = _setup("one-sphere", pixel_mask=_center_mask())
    _fd_check(f, g, params, "geom.p0", (0, 2), 2e-3, 0.05)
    _fd_check(f, g, params, "geom.radius", (0,), 2e-3, 0.08)


def test_lambertian_albedo_grad():
    f, g, params = _setup("one-sphere")
    _fd_check(f, g, params, "textures.color1", (0, 0), 1e-2, 0.1)


def test_metal_albedo_and_fuzz_grad():
    f, g, params = _setup("three-spheres")
    # Material 3 is the gold metal (builders.py three_spheres order).
    _fd_check(f, g, params, "materials.albedo", (3, 1), 1e-2, 0.1)
    _fd_check(f, g, params, "materials.fuzz", (3,), 2e-2, 0.3)


def test_dielectric_ior_grad():
    # Depth 8: glass paths (4 interface crossings for the hollow pair) must
    # escape to the sky within the depth budget or the loss is ior-flat.
    f, g, params = _setup("three-spheres", depth=8)
    # Material 2 is the glass (hollow pair shares it).
    _fd_check(f, g, params, "materials.ior", (2,), 3e-3, 0.3)


def test_noise_scale_grad_finite_and_nonzero():
    """End-to-end marble is chaotic in scale (argument frequency
    ~10*2^7*|p|), so finite differences are meaningless there; the
    end-to-end check is finite + nonzero, and exact FD runs at the
    turbulence unit level below."""
    f, g, params = _setup("two-perlin-spheres")
    gval = float(np.asarray(g(params)["textures.scale"])[0])
    assert np.isfinite(gval) and gval != 0.0


def test_perlin_gradient_vs_fd():
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu.ops import perlin

    tables = perlin.make_tables(0)
    pts = np.array([[0.37, -1.62, 2.9], [5.1, 5.2, -3.3]], np.float32)

    def f_jax(p):
        return perlin.turbulence(tables, p, jnp).sum()

    gp = np.asarray(jax.grad(f_jax)(jnp.asarray(pts)))
    # f64 central differences through the NumPy implementation.
    eps = 1e-5
    for i in range(pts.shape[0]):
        for a in range(3):
            pp = pts.astype(np.float64).copy()
            pm = pts.astype(np.float64).copy()
            pp[i, a] += eps
            pm[i, a] -= eps
            fd = (perlin.turbulence(tables, pp, np).sum()
                  - perlin.turbulence(tables, pm, np).sum()) / (2 * eps)
            np.testing.assert_allclose(gp[i, a], fd, rtol=2e-3, atol=1e-4)


def test_image_texel_grad():
    f, g, params = _setup("earth")
    g_img = np.asarray(g(params)["images.None"])
    # Some texels visible from the camera must receive gradient.
    assert np.abs(g_img).max() > 0
    nz = np.nonzero(np.abs(g_img) > np.abs(g_img).max() * 0.5)
    j, i = int(nz[1][0]), int(nz[2][0])
    f0 = float(f(params))
    arr = np.array(params["images.None"], np.float32)
    eps = 1e-2
    arr[0, j, i, 0] += eps
    p2 = dict(params)
    p2["images.None"] = jnp.asarray(arr)
    fd = (float(f(p2)) - f0) / eps
    gval = float(g_img[0, j, i, 0])
    np.testing.assert_allclose(gval, fd, rtol=0.1)


def test_gradients_finite_everywhere():
    for name in ["three-spheres", "simple-light", "cornell-smoke"]:
        f, g, params = _setup(name)
        grads = g(params)
        for k, v in grads.items():
            assert np.isfinite(np.asarray(v)).all(), (name, k)


def test_remat_gradients_match():
    """jax.checkpoint over the bounce scan must not change gradients."""
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import prepare_scene
    from hyper_ray_tracer_tpu.train import extract_params, make_loss_fn

    scene = build_scene("three-spheres")
    arrays, bvh, intersector = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    params = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.zeros((SPP, W * H), jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    args = (arrays, bvh, basis, pix, sam, np.uint32(0), target)

    g_plain = jax.jit(jax.grad(make_loss_fn(scene, W, H, 6, intersector)))(
        params, *args)
    g_remat = jax.jit(jax.grad(make_loss_fn(scene, W, H, 6, intersector,
                                            remat=True)))(params, *args)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_compacted_gradients_match(monkeypatch):
    """Training through the scheduled compacted descent must reproduce the
    fixed-scan loss AND its gradients (compaction is a permutation that
    drops only dead lanes)."""
    import jax.numpy as jnp

    import hyper_ray_tracer_tpu.render as R
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import prepare_scene
    from hyper_ray_tracer_tpu.train import (
        extract_params,
        make_loss_fn,
        measure_compact_schedule,
    )

    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 32)
    scene = build_scene("final")  # media + every material lane
    depth = 8
    arrays, bvh, intersector = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    params = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.zeros((SPP, W * H), jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    args = (arrays, bvh, basis, pix, sam, np.uint32(0), target)

    sched = measure_compact_schedule(scene, W, H, depth, intersector, arrays,
                                     bvh, basis, pix, sam)
    assert any(b is not None for b in sched), "schedule never compacts"

    plain = jax.jit(jax.value_and_grad(
        make_loss_fn(scene, W, H, depth, intersector)))
    compact = jax.jit(jax.value_and_grad(
        make_loss_fn(scene, W, H, depth, intersector, compact_sched=sched)))
    l_a, g_a = plain(params, *args)
    l_b, g_b = compact(params, *args)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_scaling_harness_runs():
    from hyper_ray_tracer_tpu.parallel.scaling import measure_scaling

    scene = build_scene("three-spheres")
    pts = measure_scaling(scene, 32, 16, 3, 4, device_counts=[1, 2, 4],
                          reps=1)
    assert [p.n_devices for p in pts] == [1, 2, 4]
    assert all(np.isfinite(p.mrays_per_s) and p.mrays_per_s > 0 for p in pts)


def test_compacted_training_overflow_tripwire(monkeypatch):
    """A stale compact schedule (too-small buckets for the current
    parameters) must make the loss explode (1e6 penalty), never silently
    bias gradients."""
    import jax.numpy as jnp

    import hyper_ray_tracer_tpu.render as R
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import prepare_scene
    from hyper_ray_tracer_tpu.train import extract_params, make_loss_fn

    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 32)
    scene = build_scene("final")
    depth = 6
    arrays, bvh, intersector = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    params = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.zeros((SPP, W * H), jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    # Absurdly small buckets: every milestone overflows.
    sched = (32,) * (depth - 1)
    loss = jax.jit(make_loss_fn(scene, W, H, depth, intersector,
                                compact_sched=sched))(
        params, arrays, bvh, basis, pix, sam, np.uint32(0), target)
    assert float(loss) > 1e5


def test_partitioned_training_matches_statistically(monkeypatch):
    """Training through the partitioned descent (device-side group AABBs)
    must track the fixed-scan loss/gradients at MC-noise scale, and must
    stay valid after a LARGE geometry change (the cull AABBs recompute
    from the current parameters every milestone)."""
    import jax.numpy as jnp

    import hyper_ray_tracer_tpu.ops.partition as Pt
    import hyper_ray_tracer_tpu.render as R
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import prepare_scene
    from hyper_ray_tracer_tpu.train import (
        extract_params,
        make_loss_fn,
        measure_partition_schedule,
    )

    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 32)
    monkeypatch.setattr(Pt, "PART_MIN_LANES", 512)
    scene = build_scene("final")
    depth = 6
    arrays, bvh, intersector = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    params = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.zeros((SPP, W * H), jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    args = (arrays, bvh, basis, pix, sam, np.uint32(0), target)

    psched = measure_partition_schedule(scene, W, H, depth, intersector,
                                        arrays, bvh, basis, pix, sam)
    assert psched is not None
    pre, entries = psched
    assert pre is not None or any(
        e is not None and len(e[0]) > 1 for e in entries), \
        "schedule never partitioned"

    plain = jax.jit(jax.value_and_grad(
        make_loss_fn(scene, W, H, depth, intersector)))
    part = jax.jit(jax.value_and_grad(
        make_loss_fn(scene, W, H, depth, intersector,
                     partition_sched=psched)))
    l_a, g_a = plain(params, *args)
    l_b, g_b = part(params, *args)
    assert float(l_b) < 1e5, "overflow tripwire fired unexpectedly"
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=2e-3)
    fa, fb = jax.tree.leaves(g_a), jax.tree.leaves(g_b)
    na = np.sqrt(sum(float((np.asarray(x) ** 2).sum()) for x in fa))
    diff = np.sqrt(sum(
        float(((np.asarray(x) - np.asarray(y)) ** 2).sum())
        for x, y in zip(fa, fb)))
    assert diff / max(na, 1e-9) < 0.05, f"gradient drift {diff/na:.4f}"

    # Move the 1000-sphere cloud far outside its baked AABB: the device
    # AABB recompute must keep the cull conservative (no tripwire, loss
    # still tracks the fixed scan).
    p0 = np.asarray(params["geom.p0"]).copy()
    p1 = np.asarray(params["geom.p1"]).copy()
    sl = slice(6, 1006)  # the cloud group (test_partition_groups_final)
    p0[sl] += np.float32([300.0, -150.0, 200.0])
    p1[sl] += np.float32([300.0, -150.0, 200.0])
    moved = {**params, "geom.p0": jnp.asarray(p0), "geom.p1": jnp.asarray(p1)}
    l_a2, _ = plain(moved, *args)
    # A teleport this large exceeds any schedule margin: the CAPACITY
    # tripwire must fire loudly (never silent bias)...
    l_b2_stale, _ = part(moved, *args)
    assert float(l_b2_stale) > 1e5, "stale schedule went undetected"
    # ...and after re-probing at the moved geometry, the partitioned loss
    # must track the fixed scan again — the device-side AABB recompute is
    # what keeps the CULL itself conservative at the new positions (the
    # baked static AABBs would silently skip the relocated cloud).
    from hyper_ray_tracer_tpu.train import merge_params

    arrays2 = merge_params(arrays, moved)
    psched2 = measure_partition_schedule(scene, W, H, depth, intersector,
                                         arrays2, bvh, basis, pix, sam)
    part2 = jax.jit(jax.value_and_grad(
        make_loss_fn(scene, W, H, depth, intersector,
                     partition_sched=psched2)))
    l_b2, _ = part2(moved, *args)
    assert float(l_b2) < 1e5, "tripwire fired after re-probe"
    np.testing.assert_allclose(float(l_a2), float(l_b2), rtol=5e-3)
