"""Edge-sampled silhouette gradients (ops/edges.py).

Round-1 limitation: the fixed-decision convention (train.py:9-16) makes
occlusion boundaries invisible to jax.grad — sphere-center FD checks only
held behind interior pixel masks.  These tests exercise the boundary term
with NO pixel mask: the loss is dominated by which pixels the silhouette
covers, exactly the regime the correction exists for.

Reference parity: the reference has no gradients at all; this covers the
north-star differentiability claim (BASELINE.md) for geometry seen through
its silhouette.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops.edges import (
    make_silhouette_correction,
    static_sphere_ids,
)
from hyper_ray_tracer_tpu.render import make_ray_colorer, prepare_scene

W, H, DEPTH = 32, 18, 3


def _setup(spp, sphere_ids=None, n_edge=64):
    scene = build_scene("one-sphere")
    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    ray_color = make_ray_colorer(scene, W, H, DEPTH, mode)
    correction = make_silhouette_correction(
        scene, W, H, DEPTH, mode, sphere_ids=sphere_ids, n_edge=n_edge)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (spp, W * H))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, W * H))

    def image_fn(dx):
        """Mean image with the hero sphere shifted +dx on x, silhouette
        term included."""
        p0 = arrays.geom.p0.at[0, 0].add(dx)
        p1 = arrays.geom.p1.at[0, 0].add(dx)
        a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
        rad = ray_color(a, bvh, basis, pix.reshape(-1), sam.reshape(-1),
                        np.uint32(0))
        img = rad.reshape(spp, W * H, 3).mean(0)
        return img + correction(a, bvh, basis, np.uint32(7))

    return image_fn


def test_correction_primal_is_zero():
    scene = build_scene("one-sphere")
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    corr = make_silhouette_correction(scene, W, H, DEPTH, mode)
    img = np.asarray(jax.jit(corr)(arrays, bvh, basis, np.uint32(0)))
    assert img.shape == (W * H, 3)
    np.testing.assert_array_equal(img, 0.0)


def test_static_sphere_ids_excludes_moving():
    scene = build_scene("random")
    ids = static_sphere_ids(scene)
    g = scene.arrays.geom
    p0 = np.asarray(g.p0)[ids]
    p1 = np.asarray(g.p1)[ids]
    assert len(ids) > 0
    np.testing.assert_array_equal(p0, p1)


def test_silhouette_grad_matches_fd_unmasked():
    """d/dx of an UNMASKED loss as the hero sphere slides sideways.

    Without the correction the fixed-decision gradient misses the
    boundary term entirely (measured on this setup: 0.0002 vs FD -0.067 —
    ~300x too small and the wrong sign); with it, jax.grad lands within
    ~8% of a finite difference that sweeps the silhouette across pixel
    samples.
    """
    image_fn = _setup(spp=48)
    # Shifted-sphere target: the loss is dominated by the strip of pixels
    # between the two silhouettes, so d loss/d dx at dx=0 IS the boundary
    # term.  (A constant target would be x-symmetric: derivative ~ 0.)
    target = jax.lax.stop_gradient(image_fn(jnp.float32(0.15)))

    def loss(dx):
        return ((image_fn(dx) - target) ** 2).mean()

    f = jax.jit(loss)
    g = jax.jit(jax.grad(loss))
    gval = float(g(jnp.float32(0.0)))
    eps = 0.03  # ~0.5 px of edge sweep: flips many per-sample decisions
    fd = (float(f(jnp.float32(eps))) - float(f(jnp.float32(-eps)))) / (
        2 * eps)
    assert abs(fd) > 1e-3, f"FD degenerate: {fd}"
    # MC estimator vs MC finite difference: generous but meaningful bound
    # (the uncorrected gradient fails it by ~300x).
    np.testing.assert_allclose(gval, fd, rtol=0.35)


def test_inverse_rendering_recovers_position_through_silhouette():
    """VERDICT round-1 'done' criterion: recover a sphere POSITION from a
    loss dominated by where its silhouette falls — no interior mask."""
    image_fn = _setup(spp=16)
    target = jax.lax.stop_gradient(image_fn(jnp.float32(0.0)))

    def loss(dx):
        return ((image_fn(dx) - target) ** 2).mean()

    opt = optax.adam(0.05)
    dx = jnp.float32(0.22)  # start ~3.5 px off
    state = opt.init(dx)

    @jax.jit
    def step(dx, state):
        l, g = jax.value_and_grad(loss)(dx)
        up, state = opt.update(g, state, dx)
        return optax.apply_updates(dx, up), state, l

    for _ in range(40):
        dx, state, l = step(dx, state)
    assert abs(float(dx)) < 0.05, float(dx)


def test_train_loss_silhouette_flag():
    """make_loss_fn(silhouette=True) composes with the train path and
    produces finite gradients for every parameter class."""
    from hyper_ray_tracer_tpu.train import extract_params, make_loss_fn

    scene = build_scene("one-sphere")
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    params = extract_params(arrays)
    spp = 2
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (spp, W * H))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, W * H))
    target = jnp.zeros((W * H, 3), jnp.float32)
    loss_fn = make_loss_fn(scene, W, H, DEPTH, mode, silhouette=True)
    grads = jax.jit(jax.grad(loss_fn))(params, arrays, bvh, basis, pix, sam,
                                       np.uint32(0), target)
    for k, v in grads.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(jnp.abs(grads["geom.p0"]).max()) > 0.0
