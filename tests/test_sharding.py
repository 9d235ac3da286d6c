"""Multi-device sharding: renders and gradients must be invariant to the
mesh (bit-identical RNG; replicated scene; psum'd gradients).

Runs on 8 virtual CPU devices (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.parallel.mesh import (
    AXIS_RAYS,
    AXIS_SPP,
    make_render_mesh,
)
from hyper_ray_tracer_tpu.parallel.render_sharded import (
    gather_image,
    make_pjit_renderer,
    make_shardmap_renderer,
)
from hyper_ray_tracer_tpu.render import RenderSettings, prepare_scene, render_image
from hyper_ray_tracer_tpu.train import make_loss_fn, make_train_step

W, H, DEPTH, SPP = 32, 16, 4, 4  # W*H divisible by 8, SPP by 2


@pytest.fixture(scope="module")
def setup():
    scene = build_scene("three-spheres")
    arrays, bvh, intersector = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    ref = render_image(scene, RenderSettings(width=W, height=H, samples=SPP,
                                             depth=DEPTH))
    return scene, arrays, bvh, intersector, basis, ref


def test_devices_available():
    assert len(jax.devices()) == 8


def test_pjit_renderer_matches_single_device(setup):
    scene, arrays, bvh, intersector, basis, ref = setup
    for shape in [(8, 1), (4, 2), (2, 4)]:
        mesh = make_render_mesh(*shape)
        run = make_pjit_renderer(scene, W, H, DEPTH, mesh, intersector)
        rad = run(arrays, bvh, basis, np.int32(0), SPP, 0)
        img = gather_image(rad, SPP, W, H)
        np.testing.assert_allclose(img, ref, atol=2e-6), shape


def test_shardmap_renderer_matches_single_device(setup):
    scene, arrays, bvh, intersector, basis, ref = setup
    mesh = make_render_mesh(4, 2)
    render = make_shardmap_renderer(scene, W, H, DEPTH, mesh, intersector)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    sharding = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    rad = render(arrays, bvh, basis, jax.device_put(pix, sharding),
                 jax.device_put(sam, sharding), np.uint32(0))
    img = gather_image(rad, SPP, W, H)
    np.testing.assert_allclose(img, ref, atol=2e-6)


def test_sharded_compaction_matches_single_device(setup, monkeypatch):
    """Probe pass (counted), scheduled compacted pass, and the plain
    uncompacted sharded renderer must all agree bit-for-bit with each
    other and match the single-device render."""
    from hyper_ray_tracer_tpu import render as R
    from hyper_ray_tracer_tpu.parallel.render_sharded import (
        make_sharded_compacting_renderer,
    )

    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 16)
    scene, arrays, bvh, intersector, basis, ref = setup
    depth = 10  # enough milestones for real compaction
    ref10 = render_image(scene, RenderSettings(width=W, height=H,
                                               samples=SPP, depth=depth))
    mesh = make_render_mesh(4, 2)
    sharding = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    pix = jax.device_put(
        jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H)),
        sharding)
    sam = jax.device_put(
        jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                         (SPP, W * H)), sharding)

    run = make_sharded_compacting_renderer(scene, W, H, depth, mesh,
                                           intersector)
    rad_probe = run(arrays, bvh, basis, pix, sam, np.uint32(0))
    rad_sched = run(arrays, bvh, basis, pix, sam, np.uint32(0))
    np.testing.assert_array_equal(rad_probe, rad_sched)

    plain = make_shardmap_renderer(scene, W, H, depth, mesh, intersector)
    rad_plain = np.asarray(plain(arrays, bvh, basis, pix, sam,
                                 np.uint32(0)))
    # ULP-level only: the segmented chain and the single 10-bounce scan
    # compile to different XLA programs whose fusions reassociate a few
    # float adds (measured max 5e-7 on values ~2.4).  The compaction
    # itself changes nothing — probe vs scheduled above is exact.
    np.testing.assert_allclose(rad_plain, rad_probe, rtol=3e-6, atol=1e-6)

    img = gather_image(jnp.asarray(rad_sched), SPP, W, H)
    np.testing.assert_allclose(img, ref10, atol=2e-6)


def test_sharded_compaction_overflow_reprobes(setup, monkeypatch):
    """A sabotaged schedule must be detected via the pmax'd overflow flag
    and the pass redone by re-probing — identical output either way."""
    from hyper_ray_tracer_tpu import render as R
    from hyper_ray_tracer_tpu.parallel.render_sharded import (
        make_sharded_compacting_renderer,
    )

    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 16)
    scene, arrays, bvh, intersector, basis, _ = setup
    depth = 10
    mesh = make_render_mesh(4, 2)
    sharding = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    pix = jax.device_put(
        jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H)),
        sharding)
    sam = jax.device_put(
        jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                         (SPP, W * H)), sharding)
    run = make_sharded_compacting_renderer(scene, W, H, depth, mesh,
                                           intersector)
    a = run(arrays, bvh, basis, pix, sam, np.uint32(0))
    cache = [c.cell_contents for c in run.__closure__
             if isinstance(c.cell_contents, dict)][0]
    (key, (sched, _block)), = cache.items()
    bad = tuple(16 for _ in sched)
    cache[key] = (bad, [c.cell_contents for c in run.__closure__
                        if callable(c.cell_contents)
                        and c.cell_contents.__name__ == "_make_scheduled"
                        ][0](bad))
    b = run(arrays, bvh, basis, pix, sam, np.uint32(0))
    np.testing.assert_array_equal(a, b)
    assert cache[key][0] != bad  # re-recorded


def test_sharded_gradients_match_unsharded(setup):
    scene, arrays, bvh, intersector, basis, _ = setup
    loss_fn = make_loss_fn(scene, W, H, DEPTH, intersector)
    from hyper_ray_tracer_tpu.train import extract_params

    params = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    target = jnp.zeros((W * H, 3), jnp.float32)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_single = grad_fn(params, arrays, bvh, basis, pix, sam, np.uint32(0),
                       target)

    mesh = make_render_mesh(4, 2)
    idsh = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    g_sharded = grad_fn(
        jax.device_put(params, NamedSharding(mesh, P())),
        jax.device_put(arrays, NamedSharding(mesh, P())),
        jax.device_put(bvh, NamedSharding(mesh, P())),
        jax.device_put(basis, NamedSharding(mesh, P())),
        jax.device_put(pix, idsh), jax.device_put(sam, idsh),
        np.uint32(0),
        jax.device_put(target, NamedSharding(mesh, P(AXIS_RAYS))),
    )
    flat_a = jax.tree.leaves(g_single)
    flat_b = jax.tree.leaves(g_sharded)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_train_step_runs_sharded(setup):
    scene, arrays, bvh, intersector, basis, _ = setup
    mesh = make_render_mesh(4, 2)
    init, step = make_train_step(scene, W, H, DEPTH, intersector)
    state = init(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    idsh = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    repl = NamedSharding(mesh, P())
    new_state, loss = jax.jit(step)(
        jax.device_put(state, repl), jax.device_put(arrays, repl),
        jax.device_put(bvh, repl), jax.device_put(basis, repl),
        jax.device_put(pix, idsh), jax.device_put(sam, idsh), np.uint32(0),
        jax.device_put(jnp.zeros((W * H, 3), jnp.float32),
                       NamedSharding(mesh, P(AXIS_RAYS))),
    )
    assert np.isfinite(float(loss))
    # Parameters actually moved.
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params))
    )
    assert moved


def test_compacted_loss_matches_unsharded(setup, monkeypatch):
    """The scheduled-compaction training forward (train.make_loss_fn with
    compact_sched) must be mesh-invariant too: same loss and gradients as
    the unsharded fixed-depth scan.  Under GSPMD the global cumsum-pack
    spans the sharded lane axis — XLA inserts the collectives; correctness
    may not depend on them."""
    import hyper_ray_tracer_tpu.render as R
    from hyper_ray_tracer_tpu.train import (
        extract_params,
        measure_compact_schedule,
    )

    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 16)
    scene, arrays, bvh, intersector, basis, _ = setup
    params = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    target = jnp.zeros((W * H, 3), jnp.float32)

    sched = measure_compact_schedule(scene, W, H, DEPTH, intersector, arrays,
                                     bvh, basis, pix, sam)
    assert any(b is not None for b in sched), "schedule never compacts"

    plain = jax.jit(jax.value_and_grad(
        make_loss_fn(scene, W, H, DEPTH, intersector)))
    compact = jax.jit(jax.value_and_grad(
        make_loss_fn(scene, W, H, DEPTH, intersector, compact_sched=sched)))
    l_ref, g_ref = plain(params, arrays, bvh, basis, pix, sam,
                         np.uint32(0), target)

    mesh = make_render_mesh(4, 2)
    idsh = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    repl = NamedSharding(mesh, P())
    l_sh, g_sh = compact(
        jax.device_put(params, repl), jax.device_put(arrays, repl),
        jax.device_put(bvh, repl), jax.device_put(basis, repl),
        jax.device_put(pix, idsh), jax.device_put(sam, idsh),
        np.uint32(0),
        jax.device_put(target, NamedSharding(mesh, P(AXIS_RAYS))),
    )
    np.testing.assert_allclose(float(l_ref), float(l_sh), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_cluster_sphereflake_matches_single_device(monkeypatch):
    """The cluster intersector + coherence-sorted compaction inside
    shard_map: the 8-device sharded sphereflake render matches the
    single-device compacted cluster render bit for bit (the sort is a
    purely local lane permutation; no collectives added)."""
    from hyper_ray_tracer_tpu import render as R
    from hyper_ray_tracer_tpu.models.builders import sphereflake
    from hyper_ray_tracer_tpu.parallel.render_sharded import (
        make_sharded_compacting_renderer,
    )

    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 16)
    scene = sphereflake(3, "sphereflake-3")
    Wf, Hf, SPPf, depth = 48, 24, 8, 8
    arrays, bvh, mode = prepare_scene(scene, "cluster")
    basis = make_basis(scene.camera, Wf, Hf)

    mesh = make_render_mesh(4, 2)
    sharding = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    pix = jax.device_put(
        jnp.broadcast_to(jnp.arange(Wf * Hf, dtype=jnp.int32),
                         (SPPf, Wf * Hf)), sharding)
    sam = jax.device_put(
        jnp.broadcast_to(jnp.arange(SPPf, dtype=jnp.int32)[:, None],
                         (SPPf, Wf * Hf)), sharding)

    run = make_sharded_compacting_renderer(scene, Wf, Hf, depth, mesh,
                                           "cluster")
    rad_probe = run(arrays, bvh, basis, pix, sam, np.uint32(1))
    rad_sched = run(arrays, bvh, basis, pix, sam, np.uint32(1))
    np.testing.assert_array_equal(rad_probe, rad_sched)

    # Single-device compacted cluster render (coherence sort on).
    single = R.make_compacting_renderer(scene, Wf, Hf, depth, "cluster")
    perm = jnp.arange(Wf * Hf, dtype=jnp.int32)
    ref = np.asarray(single(jax.device_put(arrays), jax.device_put(bvh),
                            basis, perm, 0, SPPf, np.uint32(1)))
    np.testing.assert_allclose(ref, rad_sched, rtol=3e-6, atol=1e-6)
