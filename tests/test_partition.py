"""Partitioned sweep (ops/partition.py + render.compact_wavefront_part).

The partition machinery has two layers with different contracts:

* the PERMUTATION (compact_wavefront_part) is exactly value-preserving —
  tested bitwise;
* the partitioned SWEEP is statistically identical to the plain sweep
  (ulp-level fp-contraction noise on sliced lane shapes can flip
  near-tie winners; see make_scan_intersector) — tested with drift
  bounds, plus exact determinism of repeated scheduled passes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hyper_ray_tracer_tpu.render as R
from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops import partition as P

W, H, SPP, DEPTH = 64, 36, 4, 6


@pytest.fixture(autouse=True)
def small_thresholds(monkeypatch):
    """Shrink the production lane/bucket floors so the partitioned path
    engages at test sizes."""
    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 256)
    monkeypatch.setattr(P, "PART_MIN_LANES", 1024)


@pytest.fixture(scope="module")
def final_scene():
    scene = build_scene("final")
    arrays, bvh, mode = R.prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    return scene, arrays, bvh, mode, basis


def test_partition_groups_final(final_scene):
    """The final scene yields two trimmed groups: the 1000-sphere cloud
    (heroes trimmed off the shared sphere run — their AABB inflates the
    union ~15x) and the 400-slab box grid; largest first."""
    scene, *_ = final_scene
    gs = P.partition_groups(scene.arrays.geom, scene.static.n_prims)
    assert len(gs) == 2
    sizes = [g.end - g.start for g in gs]
    assert sizes == [1000, 400]
    cloud = gs[0]
    # Trimmed cloud AABB is the rotated 165-cube + r=10 dilation region,
    # far smaller than the whole-run union that includes the heroes.
    assert cloud.bmax[0] - cloud.bmin[0] < 300.0
    assert cloud.bmin[1] > 200.0  # cloud floats above the box grid


def test_group_rows_layout():
    g = [P.PartGroup(0, 10, np.zeros(3, np.float32),
                     np.ones(3, np.float32))] * 2
    rows = P.group_rows(g, (5, 7, 11, 13))
    # layout order (masks 11, 10, 01, 00): group 0 = prefix, group 1 =
    # two ranges around group-0-only lanes.
    assert rows[0] == ((0, 12),)
    assert rows[1] == ((0, 5), (12, 23))
    # zero-width categories vanish / merge
    rows = P.group_rows(g, (0, 7, 11, 13))
    assert rows[0] == ((0, 7),)
    assert rows[1] == ((7, 18),)


def test_overlap_masks_conservative():
    g = P.PartGroup(0, 1, np.float32([0, 0, 0]), np.float32([1, 1, 1]))
    o = jnp.asarray([
        [0.5, 0.5, -1.0],   # outside, pointing in
        [0.5, 0.5, -1.0],   # outside, pointing away
        [0.5, 0.5, 0.5],    # inside
        [0.5, 0.5, 2.0],    # behind along +z
        [0.0, 0.5, -1.0],   # ON the x=0 slab plane, axis-parallel dir
    ], jnp.float32)
    d = jnp.asarray([
        [0, 0, 1], [0, 0, -1], [1, 0, 0], [0, 0, 1], [0, 0, 1],
    ], jnp.float32)
    m = np.asarray(P.overlap_masks((g,), o, d, jnp))[:, 0]
    assert list(m) == [True, False, True, False, True]


def test_partitioned_permutation_is_exact(final_scene):
    """compact_wavefront_part is a pure permutation: flushing everything
    it kept + everything it dropped reproduces the plain compaction's
    accumulator bit-for-bit."""
    scene, arrays, bvh, mode, basis = final_scene
    colorer = R.make_ray_colorer(scene, W, H, DEPTH, mode,
                                 differentiable=False)
    if not colorer.part_groups:
        pytest.skip("no groups")
    n0 = W * H * SPP
    pix = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), SPP)
    sam = jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), W * H)
    state = jax.jit(colorer.init_state)(basis, pix, sam, jnp.uint32(3))
    state = jax.jit(colorer.bounce_scan, static_argnums=(4,))(
        arrays, bvh, state, jnp.uint32(0), 2)
    acc = jnp.zeros((n0, 3), jnp.float32)
    slots = jnp.arange(n0, dtype=jnp.int32)

    counts = np.asarray(jax.jit(colorer.cat_counts)(state))
    buckets = tuple(int(-(-max(int(c), 1) // 256) * 256) for c in counts)
    dropb = int(n0 - counts.sum() + 512)
    st2, sl2, drop, over = jax.jit(
        R.compact_wavefront_part, static_argnums=(2, 3, 4, 6))(
            state, slots, buckets, dropb, colorer.part_groups,
            None, n0)
    assert not bool(np.asarray(over))
    # Alive lanes survive exactly once, in their own slot.
    alive_new = np.asarray(st2.alive)
    assert alive_new.sum() == counts.sum()
    # Resolving the drop log + final wavefront reproduces the plain
    # flush of the ORIGINAL wavefront bit-for-bit (assemble_radiance is
    # the scheduled paths' one end-of-pass flush).
    full = np.asarray(R.assemble_radiance(n0, [drop], st2, sl2))
    ref = np.asarray(R.flush_wavefront(
        jnp.zeros((n0, 3), jnp.float32), slots, state))
    np.testing.assert_array_equal(full, ref)
    # The legacy scatter-add flush agrees too (same semantics).
    acc2 = R.flush_wavefront_drop(acc, sl2, st2)
    acc2 = acc2.at[drop[1]].add(drop[0], mode="drop",
                                unique_indices=True)
    np.testing.assert_array_equal(np.asarray(acc2), ref)
    # Hole lanes are inert: dead, zero radiance, out-of-range slot.
    holes = ~alive_new
    assert (np.asarray(sl2)[holes] >= n0).all()
    assert (np.asarray(st2.radiance)[holes] == 0).all()


def test_partitioned_render_statistical_identity(final_scene):
    """Scheduled partitioned renders match the fixed scan statistically
    (rare near-tie winner flips only) and exactly repeat themselves."""
    scene, arrays, bvh, mode, basis = final_scene
    perm = jnp.asarray(R.block_order(W, H))
    run = R.make_compacting_renderer(scene, W, H, DEPTH, mode)
    probe = np.asarray(run(arrays, bvh, basis, perm, 0, SPP,
                           np.uint32(5)))
    s1 = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(5)))
    s2 = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(5)))
    np.testing.assert_array_equal(s1, s2)  # deterministic
    # The probe pass IS the fixed scan; the scheduled pass may flip a
    # handful of near-tie winners.  Bound the drift at MC scale.
    flipped = np.any(probe != s1, axis=-1)
    assert flipped.mean() < 0.02, f"{flipped.mean():.4f} of pixels flipped"
    denom = np.abs(probe).sum()
    assert np.abs(probe - s1).sum() / max(denom, 1e-6) < 5e-3


def test_partitioned_off_is_bit_identical(final_scene):
    """partition_sweep=False keeps the original exact contract."""
    scene, arrays, bvh, mode, basis = final_scene
    colorer = R.make_ray_colorer(scene, W, H, DEPTH, mode,
                                 differentiable=False)
    perm = jnp.asarray(R.block_order(W, H))
    run = R.make_compacting_renderer(scene, W, H, DEPTH, mode,
                                     partition_sweep=False)
    out1 = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(5)))
    out2 = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(5)))
    np.testing.assert_array_equal(out1, out2)
    pix = jnp.tile(perm, SPP)
    sam = jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), W * H)
    rad = jax.jit(colorer)(arrays, bvh, basis, pix, sam, np.uint32(5))
    ref = np.asarray(rad).reshape(SPP, W * H, 3).sum(0)
    np.testing.assert_array_equal(ref, out1)


def test_partition_overflow_reprobes(final_scene, monkeypatch):
    """Force category overflow: the scheduled pass must detect it and the
    renderer must fall back to a fresh counted pass (valid render)."""
    scene, arrays, bvh, mode, basis = final_scene
    perm = jnp.asarray(R.block_order(W, H))
    run = R.make_compacting_renderer(scene, W, H, DEPTH, mode)
    ref = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(5)))
    # A different seed shifts survival; with the tiny 4% headroom at this
    # size an overflow is likely but not guaranteed — instead corrupt the
    # cached schedule directly to force it.
    (key, (pre, entries)), = run.schedules.items()
    bad = [None if e is None else (tuple(x // 2 for x in e[0]), e[1])
           for e in entries]
    run.schedules[key] = (pre, bad)
    out = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(5)))
    np.testing.assert_array_equal(out, ref)
    # The re-probe rebuilt a working schedule.
    pre2, entries2 = run.schedules[key]
    assert entries2 == entries


def test_small_wavefronts_stay_plain(final_scene, monkeypatch):
    """Below PART_MIN_LANES the schedule must not emit partitioned
    milestones (production sizes: tests and oracle tiles keep the exact
    plain semantics)."""
    monkeypatch.setattr(P, "PART_MIN_LANES", 10 ** 9)
    scene, arrays, bvh, mode, basis = final_scene
    perm = jnp.asarray(R.block_order(W, H))
    run = R.make_compacting_renderer(scene, W, H, DEPTH, mode)
    out = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(5)))
    (key, sched), = run.schedules.items()
    # Below the lane floor the renderer records the PLAIN schedule form
    # (list of int-or-None) and never touches the category machinery.
    assert isinstance(sched, list)
    assert all(e is None or isinstance(e, int) for e in sched)


def test_sharded_partitioned_render(final_scene, monkeypatch):
    """The sharded compacting renderer runs the partitioned descent per
    device with one shared (worst-device) schedule: statistically matches
    its own probe, exactly repeats itself, and re-probes on overflow."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as SP

    from hyper_ray_tracer_tpu.parallel.mesh import (
        AXIS_RAYS,
        AXIS_SPP,
        make_render_mesh,
    )
    from hyper_ray_tracer_tpu.parallel.render_sharded import (
        make_sharded_compacting_renderer,
    )

    monkeypatch.setattr(P, "PART_MIN_LANES", 128)
    scene, arrays, bvh, mode, basis = final_scene
    mesh = make_render_mesh(4, 2)
    idsh = NamedSharding(mesh, SP(AXIS_SPP, AXIS_RAYS))
    repl = NamedSharding(mesh, SP())
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32),
                           (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    args = (jax.device_put(arrays, repl), jax.device_put(bvh, repl),
            jax.device_put(basis, repl), jax.device_put(pix, idsh),
            jax.device_put(sam, idsh), np.uint32(9))
    run = make_sharded_compacting_renderer(scene, W, H, DEPTH, mesh, mode)
    probe = run(*args)
    (key, (psched, block0)), = run.cache.items()
    s1 = run(*args)
    s2 = run(*args)
    np.testing.assert_array_equal(s1, s2)
    # The scheduled passes must actually have RUN scheduled (an overflow
    # would evict + re-probe, making s1 trivially equal the probe and
    # hiding e.g. a mis-sized drop region).
    assert run.cache[key][1] is block0, "scheduled pass overflowed"
    pre, entries = psched
    assert any(e is not None and len(e[0]) > 1 for e in entries), \
        "sharded schedule never partitioned"
    flipped = np.any(probe != s1, axis=-1)
    assert flipped.mean() < 0.02
    denom = np.abs(probe).sum()
    assert np.abs(probe - s1).sum() / max(denom, 1e-6) < 5e-3
    # Evicting the schedule must re-probe (device-side overflow detection
    # itself is exercised by test_partition_overflow_reprobes — the
    # sharded block shares compact_wavefront_part's flag, pmax-reduced).
    run.cache.pop(key)
    out = run(*args)  # cache miss -> fresh probe render (fixed scan)
    np.testing.assert_array_equal(out, probe)


def test_compact_part_fuzz_synthetic():
    """Synthetic fuzz: random states / groups / buckets.  Invariants:
    (a) flush(kept) + drop-flushes == per-slot radiance of all lanes
    (exact), (b) without overflow every alive lane survives exactly once
    in category-sorted order, (c) overflow flags exactly when a category
    or the drop region overruns."""
    rng = np.random.default_rng(42)
    gs = (P.PartGroup(0, 10, (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
          P.PartGroup(10, 20, (2.0, 2.0, 2.0), (4.0, 4.0, 4.0)))
    for trial in range(6):
        n = int(rng.integers(64, 257))
        o = rng.uniform(-3, 5, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        alive = rng.random(n) < rng.uniform(0.2, 0.9)
        # Production invariant (render.compact_wavefront_part): a live
        # lane's radiance is exactly zero — every emission coincides
        # with lane death (ops/materials.py: the only emitter forces
        # did_scatter=False; misses die the same bounce).  The
        # partitioned compaction RELIES on this (survivor radiance is
        # materialized as zeros, not gathered), so the fuzz respects it:
        # only dead lanes carry pending radiance.
        radiance = rng.random((n, 3)).astype(np.float32)
        radiance[alive] = 0.0
        state = R.WavefrontState(
            o=jnp.asarray(o), d=jnp.asarray(d),
            time=jnp.asarray(rng.random(n).astype(np.float32)),
            base=jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32)),
            alive=jnp.asarray(alive),
            throughput=jnp.asarray(
                rng.random((n, 3)).astype(np.float32)),
            radiance=jnp.asarray(radiance),
        )
        n0 = n + 16
        slots = jnp.asarray(
            rng.permutation(n0)[:n].astype(np.int32))
        acc = jnp.zeros((n0, 3), jnp.float32)

        catl = np.asarray(P.lane_layout_cat(gs, state.o, state.d, jnp))
        n_cat = [(alive & (catl == p)).sum() for p in range(4)]
        tight = trial % 2 == 0
        if tight:  # exact buckets + exact drop region: no overflow
            buckets = tuple(int(c) for c in n_cat)
            dropb = int(n - sum(n_cat))
        else:      # slack everywhere
            buckets = tuple(int(c) + 8 for c in n_cat)
            dropb = int(n - sum(n_cat)) + 8
        st2, sl2, drop, over = jax.jit(
            R.compact_wavefront_part, static_argnums=(2, 3, 4, 6))(
                state, slots, buckets, dropb, gs, None, n0)
        assert not bool(np.asarray(over))
        # (a) conservation per slot (the drop log + final wavefront
        # resolve to exactly the per-slot radiance of all input lanes)
        got = np.asarray(R.assemble_radiance(n0, [drop], st2, sl2))
        want = np.zeros((n0, 3), np.float32)
        np.add.at(want, np.asarray(slots), np.asarray(state.radiance))
        np.testing.assert_array_equal(got, want)
        # (b) alive lanes exactly once, category-sorted
        sl2_np = np.asarray(sl2)
        kept = sl2_np[np.asarray(st2.alive)]
        expect = np.asarray(slots)[alive]
        assert sorted(kept.tolist()) == sorted(expect.tolist())
        offs = np.concatenate([[0], np.cumsum(buckets)])
        for pcat in range(4):
            seg = np.asarray(st2.alive)[offs[pcat]:offs[pcat + 1]]
            assert seg.sum() == n_cat[pcat]
            # alive lanes pack to the front of their category
            assert seg[:int(n_cat[pcat])].all()
        # (c) overflow flags on a too-small category or drop region
        if sum(n_cat) > 0:
            big = int(np.argmax(n_cat))
            bad = tuple(int(c) - (1 if p == big else 0)
                        for p, c in enumerate(n_cat))
            *_, over_bad = jax.jit(
                R.compact_wavefront_part, static_argnums=(2, 3, 4, 6))(
                    state, slots, bad, dropb, gs, None, n0)
            assert bool(np.asarray(over_bad))
        if n - sum(n_cat) > 0:
            *_, over_drop = jax.jit(
                R.compact_wavefront_part, static_argnums=(2, 3, 4, 6))(
                    state, slots, buckets,
                    int(n - sum(n_cat)) - 1, gs, None, n0)
            assert bool(np.asarray(over_drop))


def test_partitioned_training_runs_sharded(final_scene, monkeypatch):
    """The partitioned training forward must compile and run under a
    (rays x spp) GSPMD mesh (global cumsum-packs span the sharded lane
    axis -> XLA inserts collectives) and track the unsharded fixed scan
    at MC scale."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as SP

    from hyper_ray_tracer_tpu.parallel.mesh import (
        AXIS_RAYS,
        AXIS_SPP,
        make_render_mesh,
    )
    from hyper_ray_tracer_tpu.train import (
        extract_params,
        make_loss_fn,
        measure_partition_schedule,
    )

    monkeypatch.setattr(P, "PART_MIN_LANES", 512)
    scene, arrays, bvh, mode, basis = final_scene
    params = extract_params(arrays)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32),
                           (SPP, W * H))
    sam = jnp.zeros((SPP, W * H), jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)

    psched = measure_partition_schedule(scene, W, H, DEPTH, mode, arrays,
                                        bvh, basis, pix, sam)
    assert psched is not None
    ref = jax.jit(make_loss_fn(scene, W, H, DEPTH, mode))(
        params, arrays, bvh, basis, pix, sam, np.uint32(0), target)

    mesh = make_render_mesh(4, 2)
    idsh = NamedSharding(mesh, SP(AXIS_SPP, AXIS_RAYS))
    repl = NamedSharding(mesh, SP())
    loss = jax.jit(make_loss_fn(scene, W, H, DEPTH, mode,
                                partition_sched=psched))(
        jax.device_put(params, repl), jax.device_put(arrays, repl),
        jax.device_put(bvh, repl), jax.device_put(basis, repl),
        jax.device_put(pix, idsh), jax.device_put(sam, idsh),
        np.uint32(0),
        jax.device_put(target, NamedSharding(mesh, SP(AXIS_RAYS))))
    assert float(loss) < 1e5, "tripwire fired under the mesh"
    np.testing.assert_allclose(float(ref), float(loss), rtol=2e-3)


def test_unworthy_scene_stays_bit_identical(monkeypatch):
    """A scene whose groups fail the worth gate (the random scene's
    sphere run spans the whole view) must fall back to plain milestones
    inside the partitioned machinery — and stay BITWISE identical to the
    fixed scan (no rows are ever used; the drop-region compaction is an
    exact permutation)."""
    monkeypatch.setattr(R, "_COMPACT_MIN_BUCKET", 256)
    monkeypatch.setattr(P, "PART_MIN_LANES", 1024)
    scene = build_scene("random")
    arrays, bvh, mode = R.prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    colorer = R.make_ray_colorer(scene, W, H, DEPTH, mode,
                                 differentiable=False)
    assert colorer.part_groups, "random scene should have a group"
    perm = jnp.asarray(R.block_order(W, H))
    run = R.make_compacting_renderer(scene, W, H, DEPTH, mode)
    probe = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(2)))
    (key, (pre, entries)), = run.schedules.items()
    assert pre is None
    assert all(e is None or len(e[0]) == 1 for e in entries), \
        "worth gate failed to reject"
    sched = np.asarray(run(arrays, bvh, basis, perm, 0, SPP, np.uint32(2)))
    np.testing.assert_array_equal(probe, sched)
    pix = jnp.tile(perm, SPP)
    sam = jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), W * H)
    ref = np.asarray(jax.jit(colorer)(
        arrays, bvh, basis, pix, sam, np.uint32(2))
    ).reshape(SPP, W * H, 3).sum(0)
    np.testing.assert_array_equal(ref, sched)


def test_partitioned_checkpoint_resume_bit_identical(tmp_path):
    """Default-settings (partition=True) resume is BIT-identical: the
    checkpoint records the bucket schedules, and the resumed process
    replays them instead of re-probing (VERDICT r2 weak #5).  Also
    checks the schedule JSON round-trip used by the checkpoint meta."""
    scene = build_scene("final")
    ck = str(tmp_path / "part.ckpt")
    mk = lambda samples, ckpt=None: R.RenderSettings(
        width=W, height=H, samples=samples, depth=DEPTH, seed=3,
        spp_chunk=SPP, checkpoint_path=ckpt)
    full = R.render_image(scene, mk(3 * SPP))
    # Interrupt after one chunk, then resume for the remaining two.
    R.render_image(scene, mk(SPP, ck))
    resumed = R.render_image(scene, mk(3 * SPP, ck))
    np.testing.assert_array_equal(full, resumed)


def test_checkpoint_mode_mismatch_rejected(tmp_path):
    """A checkpoint written under partition=True must not be blended
    into a partition=False render (and vice versa): the meta records the
    effective mode and the mismatch starts fresh."""
    from hyper_ray_tracer_tpu.utils import checkpoint as ckpt

    scene = build_scene("final")
    ck = str(tmp_path / "m.ckpt")
    R.render_image(scene, R.RenderSettings(
        width=W, height=H, samples=SPP, depth=DEPTH, seed=3,
        spp_chunk=SPP, checkpoint_path=ck))
    _, done, meta = ckpt.load_state(ck)
    assert meta["partition"] is True and meta["intersector"] == "sweep"
    assert "schedules" in meta and meta["schedules"]
    # Round-trip: canonical -> json -> canonical is the identity.
    for v in meta["schedules"].values():
        s = R.sched_from_json(v)
        assert R.sched_from_json(R.sched_to_json(s)) == s
    # Resume under partition=False: must reject and restart at 0 spp,
    # ending with exactly `samples` fresh samples (not a blend).
    out = R.render_image(scene, R.RenderSettings(
        width=W, height=H, samples=2 * SPP, depth=DEPTH, seed=3,
        spp_chunk=SPP, checkpoint_path=ck, partition=False))
    ref = R.render_image(scene, R.RenderSettings(
        width=W, height=H, samples=2 * SPP, depth=DEPTH, seed=3,
        spp_chunk=SPP, partition=False))
    np.testing.assert_array_equal(out, ref)
