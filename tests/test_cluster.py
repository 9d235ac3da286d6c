"""Cluster-culled intersector: layout invariants + equality with the sweep.

The cluster path (models/clusters.py + ops/cluster_sweep.py) must be an
exact pruning: every (ray, primitive) pair it skips is provably a miss
(outside every overlapped cluster's AABB or beyond the early-termination
bound), so rendered images match the dense sweep's bit for bit up to
exact-t tie-breaks (none in the reference scenes' images).
"""

import dataclasses

import numpy as np
import pytest

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.models.clusters import (
    CLUSTER_MIN_RUN,
    build_clusters,
    cluster_eligible,
)
from hyper_ray_tracer_tpu.render import (
    AUTO_CLUSTER_MIN_PRIMS,
    RenderSettings,
    block_order,
    render_image,
    resolve_intersector,
)


def test_layout_invariants_final():
    scene = build_scene("final")
    n = scene.static.n_prims
    geom, lay = build_clusters(scene.arrays.geom, n)

    # Every real primitive appears exactly once.
    real = lay.src[lay.src >= 0]
    assert np.array_equal(np.sort(real), np.arange(n))
    assert geom.ptype.shape[0] == lay.n_slots

    covered = np.zeros(lay.n_slots, bool)
    for r in lay.runs:
        assert r.width % 8 == 0
        assert len(r.types) == 1  # type-pure -> fully specialised sweep
        span = slice(r.base, r.base + r.n_clusters * r.width)
        covered[span] = True
        # Cluster AABBs bound their real members.
        src = lay.src[span].reshape(r.n_clusters, r.width)
        amin = np.asarray(scene.arrays.geom.aabb_min)
        amax = np.asarray(scene.arrays.geom.aabb_max)
        for c in range(r.n_clusters):
            members = src[c][src[c] >= 0]
            assert members.size > 0
            assert (amin[members] >= r.cmin[c] - 1e-4).all()
            assert (amax[members] <= r.cmax[c] + 1e-4).all()
    for s, w, *_ in lay.tail:
        covered[s:s + w] = True
    assert covered.all()

    # Pad slots are NaN-poisoned so they can never hit.
    pads = lay.src < 0
    if pads.any():
        assert np.isnan(geom.p0[pads]).all()
        assert np.isnan(geom.radius[pads]).all()


def test_eligibility():
    assert cluster_eligible(build_scene("final").arrays.geom,
                            build_scene("final").static.n_prims)
    cornell = build_scene("cornell")
    assert cornell.static.n_prims < CLUSTER_MIN_RUN
    assert not cluster_eligible(cornell.arrays.geom, cornell.static.n_prims)
    assert resolve_intersector(cornell, None) == "sweep"
    # Auto stays 'sweep' at reference scales (cluster-everywhere measured
    # 1.6x slower end-to-end there) and switches to 'cluster' above the
    # measured ~30k-prim crossover (tools/bench_crossover.py); it never
    # picks 'bvh' (traversal measured losing at every scale up to 300k).
    assert resolve_intersector(build_scene("final"), None) == "sweep"
    assert resolve_intersector(build_scene("final"), "cluster") == "cluster"
    assert resolve_intersector(build_scene("final"), True) == "bvh"

    big = build_scene("final")
    big = dataclasses.replace(
        big, static=dataclasses.replace(
            big.static, n_prims=AUTO_CLUSTER_MIN_PRIMS))
    assert resolve_intersector(big, None) == "cluster"


@pytest.mark.parametrize("name,s", [
    ("random", dict(width=24, height=14, samples=2, depth=6)),
    ("final", dict(width=20, height=12, samples=1, depth=6)),
])
def test_cluster_equals_sweep(name, s):
    scene = build_scene(name)
    img_sweep = render_image(scene, RenderSettings(**s, intersector="sweep"))
    img_clus = render_image(scene, RenderSettings(**s, intersector="cluster"))
    # Same math modulo fold order; XLA may fuse differently, so allclose
    # rather than bitwise (observed bit-identical on CPU).
    np.testing.assert_allclose(img_clus, img_sweep, atol=1e-5, rtol=0)


def test_cluster_forced_on_small_scene():
    """Forcing cluster mode on an all-tail scene degenerates to the sweep
    (no runs) and must still render correctly — INCLUDING with
    compaction engaged (depth >= 6), where the coherence sort must
    no-op instead of keying on nonexistent cluster bounds (review
    finding r3)."""
    scene = build_scene("cornell")
    s = dict(width=20, height=12, samples=1, depth=6)
    img_sweep = render_image(scene, RenderSettings(**s, intersector="sweep"))
    img_clus = render_image(scene, RenderSettings(**s, intersector="cluster"))
    np.testing.assert_allclose(img_clus, img_sweep, atol=1e-5, rtol=0)


def test_block_order_is_permutation():
    for w, h in ((400, 225), (24, 14), (64, 32), (65, 33)):
        perm = block_order(w, h)
        assert np.array_equal(np.sort(perm), np.arange(w * h))


def test_cluster_gradients_flow():
    """jax.grad works through the cluster intersector (traversal is a
    stop-gradient discrete search; the winner's t is recomputed)."""
    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import make_ray_colorer, prepare_scene
    from hyper_ray_tracer_tpu.train import extract_params, merge_params

    scene = build_scene("random")
    W, H, depth = 16, 10, 3
    arrays, bvh, mode = prepare_scene(scene, "cluster")
    assert mode == "cluster"
    ray_color = make_ray_colorer(scene, W, H, depth, mode)
    basis = make_basis(scene.camera, W, H)
    pix = np.arange(W * H, dtype=np.int32)
    sam = np.zeros(W * H, np.int32)
    arrays = jax.device_put(arrays)

    def loss(p):
        a = merge_params(arrays, p)
        rad = ray_color(a, bvh, basis, pix, sam, np.uint32(0))
        return (rad ** 2).mean()

    g = jax.grad(loss)(extract_params(arrays))
    g = merge_params(arrays, g)
    gm = jnp.abs(g.geom.p0).sum() + jnp.abs(g.materials.albedo).sum()
    assert np.isfinite(float(gm))
    assert float(gm) > 0.0
    # NaN-poisoned pad slots are never the winner, so they must receive
    # exactly zero gradient; real slots must stay NaN-free.
    _, lay = build_clusters(scene.arrays.geom, scene.static.n_prims)
    pads = lay.src < 0
    assert pads.any()
    gp0 = np.asarray(g.geom.p0)
    assert np.all(gp0[pads] == 0.0)
    assert not np.isnan(gp0[~pads]).any()


def test_sphereflake_auto_picks_cluster():
    """The committed showcase scene really exercises the auto 'cluster'
    branch (VERDICT r2 task 3): 66,431 primitives, above the measured
    ~30k crossover."""
    scene = build_scene("sphereflake")
    assert scene.static.n_prims >= AUTO_CLUSTER_MIN_PRIMS
    assert resolve_intersector(scene, None) == "cluster"
    assert cluster_eligible(scene.arrays.geom, scene.static.n_prims)


def test_sphereflake_cluster_equals_sweep():
    """Same flake structure at cluster-eligible size (depth 3: 822 prims,
    one 821-sphere run -> real clusters, not the all-tail degenerate)."""
    from hyper_ray_tracer_tpu.models.builders import sphereflake

    scene = sphereflake(3, "sphereflake-3")
    assert cluster_eligible(scene.arrays.geom, scene.static.n_prims)
    s = dict(width=24, height=14, samples=2, depth=6)
    img_sweep = render_image(scene, RenderSettings(**s, intersector="sweep"))
    img_clus = render_image(scene, RenderSettings(**s, intersector="cluster"))
    np.testing.assert_allclose(img_clus, img_sweep, atol=1e-5, rtol=0)


def test_two_level_cluster_equals_sweep(monkeypatch):
    """Two-level (super-cluster) culling, forced at test size by
    shrinking the production thresholds, must agree with the plain sweep
    (VERDICT r3 task 2: the 598k-1M regime's hierarchy, parity-tested
    small).  Exercises the outer super visit loop, the in-loop member
    slab resolve, NaN member padding, and both early terminations."""
    from hyper_ray_tracer_tpu.models import clusters as C
    from hyper_ray_tracer_tpu.models.builders import sphereflake
    from hyper_ray_tracer_tpu.ops import cluster_sweep as CS

    monkeypatch.setattr(C, "CLUSTER_TARGET_PRIMS", 16)
    monkeypatch.setattr(CS, "SUPER_MIN_CLUSTERS", 8)
    # Fanout 5 so the 64-cluster run is NOT a multiple of it — the last
    # super gets NaN-padded member slots, exercising that branch too.
    monkeypatch.setattr(CS, "SUPER_FANOUT", 5)

    scene = sphereflake(3, "sphereflake-3")  # 822 prims -> 64 clusters
    _, lay = build_clusters(scene.arrays.geom, scene.static.n_prims)
    two = [r for r in lay.runs if r.n_clusters >= CS.SUPER_MIN_CLUSTERS]
    assert two, "test no longer forces the two-level path"
    assert any(r.n_clusters % CS.SUPER_FANOUT for r in two), \
        "test no longer exercises the NaN member padding"

    s = dict(width=24, height=14, samples=2, depth=6)
    img_sweep = render_image(scene, RenderSettings(**s, intersector="sweep"))
    img_clus = render_image(scene, RenderSettings(**s, intersector="cluster"))
    np.testing.assert_allclose(img_clus, img_sweep, atol=1e-5, rtol=0)


def test_coherence_sort_bit_identical():
    """The coherence-sorted compaction (on by default in cluster mode) is
    a pure permutation: renders match the unsorted descent bit for bit.
    Measured on TPU v5e it cuts the sphereflake cluster render 27%
    (tools/prof_coherence.py)."""
    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.models.builders import sphereflake
    from hyper_ray_tracer_tpu.render import (
        make_compacting_renderer,
        prepare_scene,
    )

    scene = sphereflake(3, "sphereflake-3")
    W, H, SPP, depth = 48, 27, 2, 8
    arrays, bvh, _ = prepare_scene(scene, "cluster")
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, W, H)
    perm = jnp.asarray(block_order(W, H))
    outs = []
    for sort in (False, True):
        run = make_compacting_renderer(scene, W, H, depth, "cluster",
                                       coherence_sort=sort)
        outs.append(np.asarray(run(arrays, bvh, basis, perm, 0, SPP,
                                   np.uint32(3))))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_binned_traversal_equals_sweep_and_overflow(monkeypatch):
    """Round-5 super-binned traversal (ops/cluster_sweep.py
    BINNED_SECONDARY): membership re-tiling must agree with the plain
    sweep, at a roomy bin capacity AND with the capacity sabotaged so
    pairs overflow and the exact residual union loop must cover the
    dropped lanes (capacity is a performance knob, never correctness)."""
    from hyper_ray_tracer_tpu.models import clusters as C
    from hyper_ray_tracer_tpu.models.builders import sphereflake
    from hyper_ray_tracer_tpu.ops import cluster_sweep as CS

    monkeypatch.setattr(C, "CLUSTER_TARGET_PRIMS", 16)
    monkeypatch.setattr(CS, "SUPER_MIN_CLUSTERS", 8)
    monkeypatch.setattr(CS, "SUPER_FANOUT", 5)
    assert CS.BINNED_SECONDARY  # the default path under test

    scene = sphereflake(3, "sphereflake-3")
    _, lay = build_clusters(scene.arrays.geom, scene.static.n_prims)
    assert any(
        r.n_clusters >= CS.SUPER_MIN_CLUSTERS
        and r.types == {__import__(
            "hyper_ray_tracer_tpu.ops.intersect", fromlist=["PT_SPHERE"]
        ).PT_SPHERE}
        for r in lay.runs
    ), "test no longer forces a binned-eligible run"

    s = dict(width=24, height=14, samples=2, depth=6)
    img_sweep = render_image(scene, RenderSettings(**s, intersector="sweep"))
    img_bin = render_image(scene, RenderSettings(**s, intersector="cluster"))
    np.testing.assert_allclose(img_bin, img_sweep, atol=1e-5, rtol=0)

    # Sabotage the capacity: BIN_TILE/CAP_FACTOR floored so bins hold
    # almost nothing and most pairs overflow into the residual path.
    monkeypatch.setattr(CS, "BIN_TILE", 8)
    monkeypatch.setattr(CS, "BINNED_CAP_FACTOR", 1)
    img_over = render_image(scene, RenderSettings(**s, intersector="cluster"))
    np.testing.assert_allclose(img_over, img_sweep, atol=1e-5, rtol=0)

    # And binned OFF entirely still agrees (the residual union loop is
    # the round-4 two-level path).
    monkeypatch.setattr(CS, "BINNED_SECONDARY", False)
    monkeypatch.setattr(CS, "BIN_TILE", 1024)
    monkeypatch.setattr(CS, "BINNED_CAP_FACTOR", 8)
    img_off = render_image(scene, RenderSettings(**s, intersector="cluster"))
    np.testing.assert_allclose(img_off, img_sweep, atol=1e-5, rtol=0)
