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
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.models.builders import SKY
from hyper_ray_tracer_tpu.models.scene import (
    CameraConfig,
    SceneBuilder,
    rotation_matrix,
)
from hyper_ray_tracer_tpu.ops.edges import (
    box_ids_of,
    make_silhouette_correction,
    rect_ids_of,
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


def _rect_scene():
    """A lone gray rect facing the camera against a flat bright sky."""
    b = SceneBuilder()
    gray = b.lambertian(b.solid((0.4, 0.4, 0.4)))
    b.rect(0, -0.4, 0.4, -0.3, 0.3, -1.0, gray)  # XY plane at z=-1
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    return b.finalize(cam, SKY, "rect-sil")


def _box_scene():
    """A rotated solid box in front of the camera (exercises the baked
    rot/trans path of the box corner + silhouette-mask machinery)."""
    b = SceneBuilder()
    gray = b.lambertian(b.solid((0.35, 0.35, 0.35)))
    b.cuboid((-0.3, -0.3, -0.3), (0.3, 0.3, 0.3), gray,
             rot=rotation_matrix(1, 20.0), trans=(0.0, 0.0, -1.5))
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    return b.finalize(cam, SKY, "box-sil")


def _setup_shift_x(scene, spp, shift_p1_col0=True):
    """image_fn(dx): mean image with primitive 0 shifted +dx on its first
    p0/p1 component (x for spheres/XY-rects/boxes), silhouette included."""
    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    ray_color = make_ray_colorer(scene, W, H, DEPTH, mode)
    correction = make_silhouette_correction(scene, W, H, DEPTH, mode)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (spp, W * H))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, W * H))

    def image_fn(dx):
        p0 = arrays.geom.p0.at[0, 0].add(dx)
        p1 = arrays.geom.p1.at[0, 0].add(dx)
        a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
        rad = ray_color(a, bvh, basis, pix.reshape(-1), sam.reshape(-1),
                        np.uint32(0))
        img = rad.reshape(spp, W * H, 3).mean(0)
        return img + correction(a, bvh, basis, np.uint32(7))

    return image_fn


def _fd_check(image_fn, shift=0.15, eps=0.03, rtol=0.35):
    target = jax.lax.stop_gradient(image_fn(jnp.float32(shift)))

    def loss(dx):
        return ((image_fn(dx) - target) ** 2).mean()

    f = jax.jit(loss)
    g = jax.jit(jax.grad(loss))
    gval = float(g(jnp.float32(0.0)))
    fd = (float(f(jnp.float32(eps))) - float(f(jnp.float32(-eps)))) / (
        2 * eps)
    assert abs(fd) > 1e-4, f"FD degenerate: {fd}"
    np.testing.assert_allclose(gval, fd, rtol=rtol)


def test_rect_silhouette_grad_matches_fd():
    """Rect edges: d/dx of an unmasked loss as the rect slides in its own
    plane.  The fixed-decision gradient of a flat patch's position is
    EXACTLY zero (no interior shading depends on it under a constant
    material), so everything here comes from the boundary term."""
    scene = _rect_scene()
    assert len(rect_ids_of(scene)) == 1
    _fd_check(_setup_shift_x(scene, spp=48))


def test_box_silhouette_grad_matches_semianalytic():
    """Box edges through the baked rotation, validated against ground
    truth instead of an MC finite difference (which needs far more
    samples to converge than the estimator itself: measured here, MC-FD
    at 256 spp is still 18% off its own converged value while the edge
    estimator sits within ~7% of the rasterized truth).

    Setup: an EMISSIVE rotated box on black background — the expected
    image is exactly (emission x coverage), so a weighted sum of the
    image is a weighted coverage integral whose dx-derivative can be
    rasterized to high accuracy with a numpy slab test on a subpixel
    grid.  The interior (fixed-decision) term is exactly zero for an
    emissive box, so jax.grad of (MC image + correction) isolates the
    boundary term."""
    b = SceneBuilder()
    lit = b.diffuse_light(b.solid((1.0, 1.0, 1.0)))
    rot = rotation_matrix(1, 20.0)
    trans = np.array([0.0, 0.0, -1.5])
    p0w = np.array([-0.3, -0.3, -0.3])
    p1w = np.array([0.3, 0.3, 0.3])
    b.cuboid(p0w, p1w, lit, rot=rot, trans=trans)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, (0.0, 0.0, 0.0), "box-lit")
    assert len(box_ids_of(scene)) == 1

    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    ray_color = make_ray_colorer(scene, W, H, 2, mode)
    correction = make_silhouette_correction(scene, W, H, 2, mode)
    spp = 32
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (spp, W * H))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, W * H))
    wts = jnp.arange(W * H, dtype=jnp.float32)[:, None]

    def loss(dx):
        p0 = arrays.geom.p0.at[0, 0].add(dx)
        p1 = arrays.geom.p1.at[0, 0].add(dx)
        a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
        rad = ray_color(a, bvh, basis, pix.reshape(-1), sam.reshape(-1),
                        np.uint32(0))
        img = rad.reshape(spp, W * H, 3).mean(0)
        return ((img + correction(a, bvh, basis, np.uint32(7)))
                * wts).sum()

    gval = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))

    # Ground truth: weighted coverage of pinhole rays vs the rotated box
    # (slab test in object space), differenced on the smooth rasterized
    # coverage — no Monte Carlo anywhere.
    o = np.asarray(basis.origin)
    Hv = np.asarray(basis.horizontal)
    Vv = np.asarray(basis.vertical)
    llc = np.asarray(basis.lower_left)
    sub = 8
    xs = (np.arange(W * sub) + 0.5) / sub  # pixel-unit image x
    ys = (np.arange(H * sub) + 0.5) / sub
    px, py = np.meshgrid(xs, ys, indexing="ij")
    s = px.ravel() / (W - 1)
    t = py.ravel() / (H - 1)
    d = (llc + s[:, None] * Hv + t[:, None] * Vv - o)  # [M,3]
    d_obj = d @ rot  # rows: R^T @ d
    o_obj = (o - trans) @ rot
    wts_np = (np.floor(py).astype(int) * W
              + np.floor(px).astype(int)).ravel().astype(np.float64)

    def weighted_cov(dx):
        lo = p0w + np.array([dx, 0.0, 0.0])
        hi = p1w + np.array([dx, 0.0, 0.0])
        with np.errstate(divide="ignore"):
            inv = 1.0 / d_obj
        t0 = (lo - o_obj) * inv
        t1 = (hi - o_obj) * inv
        tn = np.minimum(t0, t1).max(1)
        tf = np.maximum(t0, t1).min(1)
        hit = (tf >= np.maximum(tn, 0.0))
        return 3.0 * (wts_np * hit).sum() / (sub * sub)

    eps = 0.05
    truth = (weighted_cov(eps) - weighted_cov(-eps)) / (2 * eps)
    assert abs(truth) > 1.0
    np.testing.assert_allclose(gval, truth, rtol=0.15)


def test_box_silhouette_mask_counts():
    """From a generic viewpoint a convex box shows 6 or 7 silhouette
    edges (6 when 1 face pair is viewed edge-on ... generically 6 for
    face-on, 7 for two-face, 9 for three-face corner views); the rotated
    test box shows two faces -> at most 8, at least 6."""
    import hyper_ray_tracer_tpu.ops.edges as edges

    scene = _box_scene()
    arrays, _, _ = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    ids = box_ids_of(scene)
    corners = edges._box_corners(arrays.geom, ids)
    mask = np.asarray(edges._box_silhouette_mask(
        arrays.geom, ids, corners, jnp.asarray(basis.origin)))
    assert mask.shape == (1, 12)
    assert 6 <= int(mask.sum()) <= 9, mask.sum()


def test_defocus_sphere_silhouette_grad():
    """Lens-sampled edges: an OUT-of-focus sphere under aperture 0.3 has
    its silhouette blurred over the lens disk; the estimator integrates
    the boundary term over the aperture and still matches FD."""
    b = SceneBuilder()
    gray = b.lambertian(b.solid((0.4, 0.4, 0.4)))
    b.sphere((0.0, 0.0, -1.6), 0.5, gray)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.3,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "defocus-sil")
    _fd_check(_setup_shift_x(scene, spp=64))


def test_defocus_rect_silhouette_grad():
    """Lens-sampled SEGMENT edges: an out-of-focus rect under aperture
    0.3 — the segment viewpoint/projection/probes all ride the per-sample
    lens point."""
    b = SceneBuilder()
    gray = b.lambertian(b.solid((0.4, 0.4, 0.4)))
    b.rect(0, -0.4, 0.4, -0.3, 0.3, -1.6, gray)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.3,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "rect-defocus")
    _fd_check(_setup_shift_x(scene, spp=64))


def test_moving_sphere_silhouette_grad():
    """Time-sampled edges: a motion-blurred sphere's silhouette band is
    differentiable w.r.t. BOTH center endpoints; the total matches FD and
    the p1 endpoint carries roughly half the sensitivity (uniform shutter
    lattice => mean lerp weight ~ 0.5)."""
    b = SceneBuilder()
    gray = b.lambertian(b.solid((0.4, 0.4, 0.4)))
    b.moving_sphere((-0.12, 0.0, -1.0), (0.12, 0.0, -1.0), 0.0, 1.0, 0.5,
                    gray)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "moving-sil")
    assert len(static_sphere_ids(scene)) == 0  # nothing static to cover

    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    ray_color = make_ray_colorer(scene, W, H, DEPTH, mode)
    correction = make_silhouette_correction(scene, W, H, DEPTH, mode)
    spp = 64
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (spp, W * H))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, W * H))

    def image_fn(dx0, dx1):
        p0 = arrays.geom.p0.at[0, 0].add(dx0)
        p1 = arrays.geom.p1.at[0, 0].add(dx1)
        a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
        rad = ray_color(a, bvh, basis, pix.reshape(-1), sam.reshape(-1),
                        np.uint32(0))
        img = rad.reshape(spp, W * H, 3).mean(0)
        return img + correction(a, bvh, basis, np.uint32(7))

    target = jax.lax.stop_gradient(image_fn(jnp.float32(0.15),
                                            jnp.float32(0.15)))

    def loss(dx0, dx1):
        return ((image_fn(dx0, dx1) - target) ** 2).mean()

    f = jax.jit(loss)
    g0, g1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(jnp.float32(0.0),
                                                     jnp.float32(0.0))
    g0, g1 = float(g0), float(g1)
    eps = 0.03
    fd = (float(f(jnp.float32(eps), jnp.float32(eps)))
          - float(f(jnp.float32(-eps), jnp.float32(-eps)))) / (2 * eps)
    assert abs(fd) > 1e-4, f"FD degenerate: {fd}"
    np.testing.assert_allclose(g0 + g1, fd, rtol=0.35)
    assert 0.2 < g1 / (g0 + g1) < 0.8, (g0, g1)


def test_cornell_correction_primal_zero_and_grad_finite():
    """Cornell: 6 rects + 2 rotated boxes all get edge terms; the
    correction stays exactly zero in the primal and its geometry
    gradient is finite and nonzero."""
    scene = build_scene("cornell")
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    corr = make_silhouette_correction(scene, W, H, DEPTH, mode)
    img = np.asarray(jax.jit(corr)(arrays, bvh, basis, np.uint32(0)))
    np.testing.assert_array_equal(img, 0.0)

    def through(p0):
        a = arrays._replace(geom=arrays.geom._replace(p0=p0))
        return (corr(a, bvh, basis, np.uint32(0)) * 7.0).sum()

    g = np.asarray(jax.jit(jax.grad(through))(arrays.geom.p0))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


@pytest.mark.slow
def test_light_position_recovery_through_silhouette():
    """Condensed examples/inverse_geometry.py: recover the cornell
    ceiling light's in-plane position — geometry the loss sees only
    through where its bright outline falls (which paths hit the emitter
    is discrete, so the interior gradient is ~blind to it)."""
    import optax

    from hyper_ray_tracer_tpu.models.scene import MT_DIFFUSE_LIGHT
    from hyper_ray_tracer_tpu.train import (
        TrainState,
        extract_params,
        make_loss_fn,
    )

    Wl = Hl = 48
    SPP, DEPTHL = 2, 2
    scene = build_scene("cornell")
    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, Wl, Hl)
    mat_of_prim = np.asarray(
        scene.arrays.geom.material)[: scene.static.n_prims]
    light = int(np.flatnonzero(
        np.asarray(scene.arrays.materials.mtype)[mat_of_prim]
        == MT_DIFFUSE_LIGHT)[0])

    ray_color = make_ray_colorer(scene, Wl, Hl, DEPTHL, mode)
    pix = jnp.broadcast_to(jnp.arange(Wl * Hl, dtype=jnp.int32),
                           (SPP, Wl * Hl))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, Wl * Hl))
    rad = ray_color(arrays, bvh, basis, pix.reshape(-1), sam.reshape(-1),
                    np.uint32(0))
    target = jax.lax.stop_gradient(rad.reshape(SPP, Wl * Hl, 3).mean(0))

    tp = extract_params(arrays)
    p0 = np.asarray(tp["geom.p0"]).copy()
    p1 = np.asarray(tp["geom.p1"]).copy()
    shift = np.float32([25.0, -20.0, 0.0])
    p0[light] += shift
    p1[light] += shift
    params = {**tp, "geom.p0": jnp.asarray(p0), "geom.p1": jnp.asarray(p1)}

    loss_fn = make_loss_fn(scene, Wl, Hl, DEPTHL, mode, silhouette=True)
    opt = optax.adam(2.5)
    row = (jnp.zeros((p0.shape[0], 3), jnp.float32)
           .at[light, 0].set(1.0).at[light, 1].set(1.0))

    @jax.jit
    def step(state):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, arrays, bvh, basis, pix, sam, np.uint32(0),
            target)
        grads = {k: (g * row if k in ("geom.p0", "geom.p1")
                     else jnp.zeros_like(g))
                 for k, g in grads.items()}
        up, opt_state = opt.update(grads, state.opt_state, state.params)
        return TrainState(params=optax.apply_updates(state.params, up),
                          opt_state=opt_state), loss

    def err(params):
        return float(np.abs(np.asarray(params["geom.p0"])[light]
                            - np.asarray(tp["geom.p0"])[light]).max())

    e0 = err(params)
    state = TrainState(params=params, opt_state=opt.init(params))
    for _ in range(35):
        state, _ = step(state)
    e1 = err(state.params)
    assert e1 < 0.4 * e0, (e0, e1)


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


def _mirror_scene(fuzz=0.0):
    """A polished metal rect mirror facing the camera + a diffuse sphere
    BEHIND the camera: the sphere is visible ONLY via the specular bounce
    (the round-2 neglected term, VERDICT r2 task 4; geometry inspired by
    the reference's polished hero sphere, application.rs:560-563, but
    planar so the virtual-image construction is exact)."""
    b = SceneBuilder()
    mirror = b.metal((0.95, 0.95, 0.95), fuzz)
    b.rect(0, -0.6, 0.6, -0.6, 0.6, -1.0, mirror)  # XY plane at z=-1
    red = b.lambertian(b.solid((0.7, 0.15, 0.1)))
    b.sphere((0.3, 0.0, 1.2), 0.35, red)  # behind the camera
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    return b.finalize(cam, SKY, "mirror-sil")


def _setup_shift_prim(scene, spp, prim, mirror_ids=None, depth=3,
                      mirror_sphere_ids=None):
    """image_fn(dx): mean image with primitive ``prim`` shifted +dx on x,
    silhouette correction included (optionally with forced mirror set)."""
    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    ray_color = make_ray_colorer(scene, W, H, depth, mode)
    correction = make_silhouette_correction(
        scene, W, H, depth, mode, mirror_ids=mirror_ids,
        mirror_sphere_ids=mirror_sphere_ids)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (spp, W * H))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, W * H))

    def image_fn(dx):
        p0 = arrays.geom.p0.at[prim, 0].add(dx)
        p1 = arrays.geom.p1.at[prim, 0].add(dx)
        a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
        rad = ray_color(a, bvh, basis, pix.reshape(-1), sam.reshape(-1),
                        np.uint32(0))
        img = rad.reshape(spp, W * H, 3).mean(0)
        return img + correction(a, bvh, basis, np.uint32(7))

    return image_fn


def test_mirror_silhouette_grad_matches_fd():
    """A sphere visible ONLY in a planar mirror: the virtual-image edge
    family restores the bounced boundary term to FD accuracy, while
    without it (mirror_ids=[]) the gradient misses most of the
    derivative — the measured round-2 gap, now closed for planar
    mirrors."""
    from hyper_ray_tracer_tpu.ops.edges import mirror_rect_ids_of

    scene = _mirror_scene()
    assert len(mirror_rect_ids_of(scene)) == 1
    from hyper_ray_tracer_tpu.models.scene import PT_SPHERE
    sphere_prim = int(np.flatnonzero(
        np.asarray(scene.arrays.geom.ptype)[:scene.static.n_prims]
        == PT_SPHERE)[0])

    def run(mirror_ids):
        image_fn = _setup_shift_prim(_mirror_scene(), 48, sphere_prim,
                                     mirror_ids=mirror_ids)
        target = jax.lax.stop_gradient(image_fn(jnp.float32(0.15)))

        def loss(dx):
            return ((image_fn(dx) - target) ** 2).mean()

        f = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
        eps = 0.03
        fd = (float(f(jnp.float32(eps)))
              - float(f(jnp.float32(-eps)))) / (2 * eps)
        return g, fd

    g_off, fd = run(mirror_ids=np.zeros(0, np.int32))
    g_on, fd_on = run(mirror_ids=None)  # auto: detects the mirror
    assert abs(fd) > 1e-4, f"FD degenerate: {fd}"
    # Without the mirror family the bounced boundary term is absent:
    # the gradient misses most of the true derivative.
    assert abs(g_off - fd) > 0.5 * abs(fd), (g_off, fd)
    np.testing.assert_allclose(g_on, fd_on, rtol=0.35)


def test_mirror_self_exclusion_no_double_count():
    """The mirror's own edges must not be double-counted through their
    own reflection (they reflect onto themselves): the in-plane shift
    gradient of a lone mirror rect still matches FD (a double count
    would land at ~2x)."""
    b = SceneBuilder()
    mirror = b.metal((0.9, 0.9, 0.9), 0.0)
    b.rect(0, -0.4, 0.4, -0.3, 0.3, -1.0, mirror)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "mirror-only")
    image_fn = _setup_shift_prim(scene, 48, 0)
    _fd_check(image_fn)


def _curved_mirror_rig():
    b = SceneBuilder()
    b.sphere((0.0, 0.0, -1.3), 0.8, b.metal((0.9, 0.9, 0.95), 0.0))
    red = b.lambertian(b.solid((0.7, 0.15, 0.1)))
    b.sphere((0.4, 0.0, 1.5), 0.45, red)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "curved-mirror")
    from hyper_ray_tracer_tpu.models.scene import PT_SPHERE
    pt = np.asarray(scene.arrays.geom.ptype)[:scene.static.n_prims]
    # the red sphere is the one behind the camera (p0 z > 0)
    z = np.asarray(scene.arrays.geom.p0)[:scene.static.n_prims, 2]
    prim = int(np.flatnonzero((pt == PT_SPHERE) & (z > 0))[0])
    return scene, prim


def test_curved_mirror_silhouette_grad_matches_fd():
    """A sphere visible ONLY in a polished-SPHERE mirror (the round-2
    'out of scope' case, application.rs:560-563 geometry): the unrolled
    Alhazen + tangency-Newton curve family restores the bounced boundary
    term to FD accuracy; without it (mirror_sphere_ids=[]) the gradient
    misses most of the derivative (measured 100% in round 3 before the
    extension)."""
    from hyper_ray_tracer_tpu.ops.edges import mirror_sphere_ids_of

    scene, prim = _curved_mirror_rig()
    assert len(mirror_sphere_ids_of(scene)) == 1

    def run(ms_ids):
        image_fn = _setup_shift_prim(_curved_mirror_rig()[0], 48, prim,
                                     mirror_sphere_ids=ms_ids)
        target = jax.lax.stop_gradient(image_fn(jnp.float32(0.2)))

        def loss(dx):
            return ((image_fn(dx) - target) ** 2).mean()

        f = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
        eps = 0.04
        fd = (float(f(jnp.float32(eps)))
              - float(f(jnp.float32(-eps)))) / (2 * eps)
        return g, fd

    g_off, fd = run(np.zeros(0, np.int32))
    g_on, fd_on = run(None)  # auto: detects the sphere mirror
    assert abs(fd) > 1e-4, f"FD degenerate: {fd}"
    assert abs(g_off - fd) > 0.5 * abs(fd), (g_off, fd)
    print(f"curved mirror: grad {g_on:.5f} vs fd {fd_on:.5f} "
          f"(off: {g_off:.5f})")
    np.testing.assert_allclose(g_on, fd_on, rtol=0.35)


def test_random_scene_hero_is_curved_mirror():
    """Auto-detection on a reference scene: the random scene's polished
    metal hero sphere (application.rs:560-563, fuzz 0) is its one curved
    mirror, and the full correction (direct + curved families) stays
    zero-primal and finite-gradient there."""
    from hyper_ray_tracer_tpu.ops.edges import mirror_sphere_ids_of
    from hyper_ray_tracer_tpu.train import extract_params, merge_params

    scene = build_scene("random")
    ms = mirror_sphere_ids_of(scene)
    assert len(ms) == 1
    g = scene.arrays.geom
    # fuzz-0 metal with unit radius at (4, 1, 0): the hero.
    np.testing.assert_allclose(np.asarray(g.p0)[ms[0]], [4.0, 1.0, 0.0])
    assert float(np.asarray(g.radius)[ms[0]]) == 1.0

    arrays, bvh, mode = prepare_scene(scene)
    arrays = jax.device_put(arrays)
    basis = make_basis(scene.camera, W, H)
    corr = make_silhouette_correction(scene, W, H, DEPTH, mode,
                                      mirror_pairs_max=8, n_edge=16)
    img = np.asarray(jax.jit(corr)(arrays, bvh, basis, np.uint32(0)))
    np.testing.assert_array_equal(img, 0.0)  # straight-through primal

    def loss(p):
        a = merge_params(arrays, p)
        return (corr(a, bvh, basis, np.uint32(0)) ** 2).sum() \
            + (corr(a, bvh, basis, np.uint32(0))
               * jnp.ones((W * H, 3))).sum()

    grads = jax.grad(loss)(extract_params(arrays))
    for k, v in grads.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_rect_in_curved_mirror_grad_matches_fd():
    """A rect visible ONLY in a polished-sphere mirror: segment sources
    get per-sample Alhazen chief solves (_curved_mirror_point_xy), so
    the in-plane position gradient matches FD; without the family
    (mirror_sphere_ids=[]) it is mostly missing."""
    def rig():
        b = SceneBuilder()
        b.sphere((0.0, 0.0, -1.3), 0.8, b.metal((0.9, 0.9, 0.95), 0.0))
        gray = b.lambertian(b.solid((0.75, 0.3, 0.1)))
        b.rect(0, 0.0, 0.8, -0.4, 0.4, 1.5, gray)  # XY at z=+1.5 (behind)
        cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                           focus_dist=1.0)
        return b.finalize(cam, SKY, "rect-curved-mirror")

    scene = rig()
    prim = int(rect_ids_of(scene)[0])

    def run(ms_ids):
        image_fn = _setup_shift_prim(rig(), 48, prim,
                                     mirror_sphere_ids=ms_ids)
        target = jax.lax.stop_gradient(image_fn(jnp.float32(0.2)))

        def loss(dx):
            return ((image_fn(dx) - target) ** 2).mean()

        f = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
        eps = 0.04
        fd = (float(f(jnp.float32(eps)))
              - float(f(jnp.float32(-eps)))) / (2 * eps)
        return g, fd

    g_off, fd = run(np.zeros(0, np.int32))
    g_on, fd_on = run(None)
    assert abs(fd) > 1e-4, f"FD degenerate: {fd}"
    assert abs(g_off - fd) > 0.5 * abs(fd), (g_off, fd)
    print(f"rect-in-curved-mirror: grad {g_on:.5f} vs fd {fd_on:.5f} "
          f"(off: {g_off:.5f})")
    np.testing.assert_allclose(g_on, fd_on, rtol=0.35)


def _glass_rig():
    """A source sphere whose image inside a glass ball's disk is the only
    loss signal (VERDICT r3 task 4: the refractive analogue of the
    curved-mirror rig; glass hero geometry application.rs:551,
    dielectric.rs:31-55)."""
    b = SceneBuilder()
    b.sphere((0.0, 0.0, -1.3), 0.5, b.dielectric(1.5))
    red = b.lambertian(b.solid((0.8, 0.1, 0.05)))
    b.sphere((1.4, 0.0, -3.0), 0.5, red)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 60.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "glass-rig")
    from hyper_ray_tracer_tpu.models.scene import MT_LAMBERTIAN
    mt = np.asarray(scene.arrays.materials.mtype)[
        np.asarray(scene.arrays.geom.material)[:scene.static.n_prims]]
    prim = int(np.flatnonzero(mt == MT_LAMBERTIAN)[0])
    return scene, prim


def test_glass_silhouette_grad_matches_fd():
    """A sphere seen THROUGH a glass ball (refracted, inverted image near
    the limb): the doubly-refracted chief + tangency solve
    (ops/edges._glass_sphere_xy) restores the refractive boundary term.
    Measured on this rig: without the family the gradient inside the
    ball's disk is EXACTLY ZERO while FD is finite (100% of the
    derivative missing — the round-3 verdict's unquantified gap); with
    it ~82% is captured at this resolution (the remainder is
    second-order paths — internal Fresnel reflections — and the O(eps)
    probe bias on a strongly compressed image; ops/edges.py scope
    notes)."""
    Wg, Hg, spp, depth = 64, 36, 32, 4
    scene, prim = _glass_rig()
    from hyper_ray_tracer_tpu.ops.edges import glass_sphere_ids_of
    assert len(glass_sphere_ids_of(scene)) == 1

    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, Wg, Hg)
    ray_color = make_ray_colorer(scene, Wg, Hg, depth, mode)
    pix = jnp.broadcast_to(jnp.arange(Wg * Hg, dtype=jnp.int32),
                           (spp, Wg * Hg))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, Wg * Hg))

    # Loss window: the LEFT half of the glass ball's projected disk —
    # contains the refracted (inverted) image, excludes the source's
    # direct image at the right edge (whose boundary term the direct
    # family already covers).
    xs = (np.arange(Wg) + 0.5) / (Wg - 1)
    ys = (np.arange(Hg) + 0.5) / (Hg - 1)
    cnp = np.array([0.0, 0.0, -1.3])
    llc = np.asarray(basis.lower_left)
    hor = np.asarray(basis.horizontal)
    ver = np.asarray(basis.vertical)
    org = np.asarray(basis.origin)
    mask = np.zeros(Wg * Hg, bool)
    for j in range(Hg):
        for i in range(Wg):
            d = llc + xs[i] * hor + ys[j] * ver - org
            oc = org - cnp
            bq = oc @ d
            disc = bq * bq - (d @ d) * (oc @ oc - 0.25)
            mask[j * Wg + i] = (disc > 0) and (i < Wg // 2)
    assert mask.any()
    mask_j = jnp.asarray(mask.astype(np.float32))[:, None]

    def run(gids):
        corr = make_silhouette_correction(scene, Wg, Hg, depth, mode,
                                          glass_sphere_ids=gids,
                                          n_edge=128)

        def image_fn(dx):
            p0 = arrays.geom.p0.at[prim, 0].add(dx)
            p1 = arrays.geom.p1.at[prim, 0].add(dx)
            a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
            rad = ray_color(a, bvh, basis, pix.reshape(-1),
                            sam.reshape(-1), np.uint32(0))
            img = rad.reshape(spp, Wg * Hg, 3).mean(0)
            return img + corr(a, bvh, basis, np.uint32(7))

        target = jax.lax.stop_gradient(image_fn(jnp.float32(0.2)))

        def loss(dx):
            return (((image_fn(dx) - target) ** 2) * mask_j).mean()

        f = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
        eps = 0.04
        fd = (float(f(jnp.float32(eps)))
              - float(f(jnp.float32(-eps)))) / (2 * eps)
        return g, fd

    g_off, fd_off = run(np.zeros(0, np.int32))
    g_on, fd_on = run(None)  # auto: detects the glass sphere
    assert abs(fd_on) > 1e-4, f"FD degenerate: {fd_on}"
    # Without the family the refractive boundary term is missing almost
    # entirely; with it the gradient lands within the same tolerance the
    # curved-mirror family is held to.
    assert abs(g_off - fd_off) > 0.5 * abs(fd_off), (g_off, fd_off)
    print(f"glass: grad {g_on:.6f} vs fd {fd_on:.6f} (off: {g_off:.6f})")
    np.testing.assert_allclose(g_on, fd_on, rtol=0.35)


@pytest.mark.slow
def test_glass_full_disk_residual_bound():
    """VERDICT r4 task 5 (bound half): the full projected disk of the
    solid glass ball keeps a measured residual after all three solid
    families — higher-order paths (T*R^k*T for k >= 2, composites) with
    individually sub-percent radiance (docs/DESIGN.md §16).  Pin the
    measured coverage so regressions in any family are caught: round-5
    measurement on this rig/shape was ratio 0.759 (grad -7.57e-4 vs FD
    -9.97e-4 at 64x36x32spp depth 4, n_edge=128)."""
    Wg, Hg, spp, depth = 64, 36, 32, 4
    scene, prim = _glass_rig()
    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, Wg, Hg)
    ray_color = make_ray_colorer(scene, Wg, Hg, depth, mode)
    pix = jnp.broadcast_to(jnp.arange(Wg * Hg, dtype=jnp.int32),
                           (spp, Wg * Hg))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, Wg * Hg))
    mask_j = jnp.asarray(_disk_mask(basis, Wg, Hg, (0.0, 0.0, -1.3), 0.5)
                         .astype(np.float32))[:, None]
    corr = make_silhouette_correction(scene, Wg, Hg, depth, mode,
                                      n_edge=128)

    def image_fn(dx):
        p0 = arrays.geom.p0.at[prim, 0].add(dx)
        p1 = arrays.geom.p1.at[prim, 0].add(dx)
        a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
        rad = ray_color(a, bvh, basis, pix.reshape(-1),
                        sam.reshape(-1), np.uint32(0))
        img = rad.reshape(spp, Wg * Hg, 3).mean(0)
        return img + corr(a, bvh, basis, np.uint32(7))

    target = jax.lax.stop_gradient(image_fn(jnp.float32(0.2)))

    def loss(dx):
        return (((image_fn(dx) - target) ** 2) * mask_j).mean()

    f = jax.jit(loss)
    g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
    eps = 0.04
    fd = (float(f(jnp.float32(eps)))
          - float(f(jnp.float32(-eps)))) / (2 * eps)
    assert abs(fd) > 1e-4, f"FD degenerate: {fd}"
    ratio = g / fd
    print(f"glass full disk: grad {g:.6f} vs fd {fd:.6f} ratio {ratio:.3f}")
    # Documented residual band: must neither collapse (family lost)
    # nor overshoot (double counting).
    assert 0.60 < ratio < 1.15, ratio


def _disk_mask(basis, Wg, Hg, center, radius):
    """Pixel mask of a sphere's projected disk (pinhole rays)."""
    xs = (np.arange(Wg) + 0.5) / (Wg - 1)
    ys = (np.arange(Hg) + 0.5) / (Hg - 1)
    cnp = np.asarray(center, np.float64)
    llc = np.asarray(basis.lower_left)
    hor = np.asarray(basis.horizontal)
    ver = np.asarray(basis.vertical)
    org = np.asarray(basis.origin)
    d = (llc[None, None] + xs[None, :, None] * hor[None, None]
         + ys[:, None, None] * ver[None, None] - org[None, None])
    oc = org - cnp
    bq = (d * oc).sum(-1)
    disc = bq * bq - (d * d).sum(-1) * (oc @ oc - radius * radius)
    return (disc > 0).reshape(Wg * Hg)


def _hollow_rig():
    """Hollow glass shell (outer 0.5, inner -0.45 — BASELINE config 2's
    negative-radius pair, dielectric.rs:31-55 with the sphere.rs normal
    flip) in front of the camera; a red source sphere behind it,
    visible only through the shell's disk."""
    b = SceneBuilder()
    glass = b.dielectric(1.5)
    b.sphere((0.0, 0.0, -1.3), 0.5, glass)
    b.sphere((0.0, 0.0, -1.3), -0.45, glass)
    red = b.lambertian(b.solid((0.8, 0.1, 0.05)))
    b.sphere((0.5, 0.0, -3.0), 0.5, red)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 60.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "hollow-glass-rig")
    from hyper_ray_tracer_tpu.models.scene import MT_LAMBERTIAN
    mt = np.asarray(scene.arrays.materials.mtype)[
        np.asarray(scene.arrays.geom.material)[:scene.static.n_prims]]
    prim = int(np.flatnonzero(mt == MT_LAMBERTIAN)[0])
    return scene, prim


@pytest.mark.slow
def test_hollow_shell_silhouette_grad_matches_fd():
    """VERDICT r4 task 5 (family half): a source seen THROUGH a hollow
    glass shell.  The interior term is exactly zero (flat sky,
    lambertian source: radiance is pure visibility), so FD is 100%
    boundary term.  Round-5 measurements on this rig (64x36x32spp,
    depth 7 — four glass interfaces + source + scatter + sky):

      no correction                      ratio 0.000
      direct families only (shells
        excluded from glass families)    ratio 0.553
      + 4-interface shell family,
        UNGATED                          ratio 1.459  (double count)
      + _edge_blocked direct-family gate ratio 0.906

    The gate is what makes the family additive instead of
    double-counting: a thin shell deflects the through-image by less
    than the probe offset, so the direct curve sees the same radiance
    step (ops/edges._edge_blocked)."""
    from hyper_ray_tracer_tpu.ops.edges import glass_shell_pairs_of

    Wg, Hg, spp, depth = 64, 36, 32, 7
    scene, prim = _hollow_rig()
    assert len(glass_shell_pairs_of(scene)) == 1
    from hyper_ray_tracer_tpu.ops.edges import glass_sphere_ids_of
    assert len(glass_sphere_ids_of(scene)) == 0  # shell outer excluded

    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, Wg, Hg)
    ray_color = make_ray_colorer(scene, Wg, Hg, depth, mode)
    pix = jnp.broadcast_to(jnp.arange(Wg * Hg, dtype=jnp.int32),
                           (spp, Wg * Hg))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, Wg * Hg))
    mask_j = jnp.asarray(_disk_mask(basis, Wg, Hg, (0.0, 0.0, -1.3), 0.5)
                         .astype(np.float32))[:, None]

    def run(glass_shells):
        corr = make_silhouette_correction(scene, Wg, Hg, depth, mode,
                                          n_edge=128,
                                          glass_shells=glass_shells)

        def image_fn(dx):
            p0 = arrays.geom.p0.at[prim, 0].add(dx)
            p1 = arrays.geom.p1.at[prim, 0].add(dx)
            a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
            rad = ray_color(a, bvh, basis, pix.reshape(-1),
                            sam.reshape(-1), np.uint32(0))
            img = rad.reshape(spp, Wg * Hg, 3).mean(0)
            return img + corr(a, bvh, basis, np.uint32(7))

        target = jax.lax.stop_gradient(image_fn(jnp.float32(0.2)))

        def loss(dx):
            return (((image_fn(dx) - target) ** 2) * mask_j).mean()

        f = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
        eps = 0.04
        fd = (float(f(jnp.float32(eps)))
              - float(f(jnp.float32(-eps)))) / (2 * eps)
        return g, fd

    g_off, fd_off = run(np.zeros((0, 2), np.int32))
    g_on, fd_on = run(None)  # auto: detects the shell pair
    assert abs(fd_on) > 1e-4, f"FD degenerate: {fd_on}"
    # Without the shell family roughly half the derivative is missing.
    assert abs(g_off - fd_off) > 0.25 * abs(fd_off), (g_off, fd_off)
    print(f"hollow shell: grad {g_on:.6f} vs fd {fd_on:.6f} "
          f"(direct-only: {g_off:.6f})")
    np.testing.assert_allclose(g_on, fd_on, rtol=0.25)
