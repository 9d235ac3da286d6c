"""Tile-culled cluster sweep: the cluster-pruned dense intersector.

This is the TPU-native analogue of the pruning the reference gets from its
BVH (`/root/reference/src/hittable/bvh_node.rs:104-127`), engineered around
the two measured pathologies of this machine (docs/DESIGN.md §1):
per-element gathers (~1.8 ns/elem) and lockstep divergence.

Shape of the algorithm (validated by prototype, tools/proto_cluster.py —
the scan-over-ray-tiles machinery runs *faster* than one monolithic
broadcast even at equal pair counts, and the win scales linearly with the
culled fraction):

One ``lax.scan`` over ray-tiles of ``RAY_TILE`` lanes; each tile first
sweeps the small always-on tail (media, lights, feature objects), then —
per cluster run — slab-tests the tile's lanes against the run's box set
([tile, C] pure VPU math, zero gathers) and runs one dynamic-trip
``lax.while_loop`` visiting only the boxes some lane can still improve,
nearest first.  Cluster primitives arrive via a contiguous static-width
``dynamic_slice`` — never a gather.  The loop exits early once the next
cluster's entry t lies beyond every lane's current best hit (the
vectorised equivalent of the reference's t_max-clamped ordered descent).
The box test is t_best-aware and PER LANE (``lo < t_best[lane]``,
_tile_cull): running it inside the tile body, after the tail sweep
pinned e.g. the ground-sphere hit distance, is what lets miss-bound
lanes stop forcing visits — the round-4 "lane-granular culling" step.

Correctness notes:
* Closest-hit semantics match list.rs/bvh_node.rs: a strict ``<`` fold, so
  processing order only affects exact-t ties (coplanar geometry), which are
  image-equivalent (same t, same oriented normal; see models/scene.py
  docstring).
* Media free-flight draws are salted by ``stable_id`` and independent of
  t_max (the scatter distance never depends on the clip), so cluster
  visit order cannot change any medium interaction.
* Pad slots carry NaN geometry (models/clusters.py): every accept mask
  compares False against NaN, so pads never hit.

Ray tiles want *coherent* rays (they share a cluster working set); the
renderer launches camera rays in image-block order (render.block_order)
and dead-ray compaction preserves that order (stable pack).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import BIG, PrimFields, make_prim_intersector

# Rays per tile: large enough to amortise per-cluster loop overhead,
# small enough that an image-block of rays shares most of its cluster
# set (the tile's visit list is the UNION of its lanes' overlap sets,
# and incoherent secondary bounces pay that union — docs/DESIGN.md §14).
# Round-2 prototype measured flat 1024..4096 on TPU v5e at 66k prims
# (one-level, 256 clusters); at 598k (two-level, 2048 clusters) the
# union effect makes 1024 ~10% faster than 2048 — so two-level scenes
# take the smaller tile.
RAY_TILE = 2048
RAY_TILE_TWO_LEVEL = 1024

# Two-level hierarchy (VERDICT r3 task 2): above this many clusters in a
# run, Phase A tests SUPER-cluster AABBs only ([tile, S] instead of
# [tile, C]) and Phase B resolves member clusters inside the visit loop.
# The recursive median split emits clusters in spatial DFS order, so
# consecutive blocks of SUPER_FANOUT clusters are already compact — the
# super boxes are plain blockwise unions, no extra build pass.
SUPER_MIN_CLUSTERS = 512
SUPER_FANOUT = 64

# Clusters processed per visit-loop trip.  Built in round 5 on the
# hypothesis (from fitting t = a*visits + b*pairs to the granularity
# sweep) that per-trip overhead dominated; MEASURED NEGATIVE at width
# 4 on both flakes — 598k: 2.42 s vs 2.29 s at width 1; 66k: 0.417 vs
# 0.454 Mrays/s — widening trades the per-trip overhead for a staler
# t_best inside the trip (more candidates pass the t_max test) and a
# concatenated [tile, KV*cw] intermediate, and loses on both.  The
# machinery stays (width 1 is the plain loop, and the fold is
# closest-hit-exact at any width — pinned by the cluster parity
# tests); the default stays 1.
VISIT_WIDTH = 1

# SUPER-BINNED traversal (round 5; docs/DESIGN.md §22): for two-level
# static-sphere runs, re-tile the rays BY SUPER MEMBERSHIP instead of
# launch order — every (lane, super) overlap pair becomes one bin row,
# each super's bins fold only over that super's member clusters, and a
# scatter-merge carries (t_best, best) between supers.  This removes
# the tile-UNION effect entirely (a lane never visits a cluster only
# its tile-mates overlap), which was the measured wall on incoherent
# secondary bounces (§14/§18).  Prototype tools/proto_binned.py at 1M
# prims: sorted secondary 567 -> 226 ms with exact parity.  Bins have a
# static per-super capacity (BINNED_CAP_FACTOR * n / S, BIN_TILE
# rounded); lanes whose pairs overflow a bin are re-traced exactly by
# the ORIGINAL per-tile union loop in a residual pass, so capacity is a
# performance knob, never a correctness one.
BINNED_SECONDARY = True
BINNED_CAP_FACTOR = 8
BIN_TILE = 1024
# Binning granularity: clusters per binning-super.  Independent of the
# visit hierarchy's SUPER_FANOUT — finer binning supers have tighter
# boxes (fewer false pairs), isolate outlier clusters (the flake's
# r=1000 ground) into smaller excluded groups, and bound each bin
# tile's member loop; coarser ones amortize per-super overhead.
# Swept on the 598k flake (tools/bench_flake): see DESIGN.md §22.
BINNED_FANOUT = 32


def _super_bounds_np(r):
    """Blockwise super-cluster AABBs of a run ([S,3] min/max, f32): the
    recursive median split emits clusters in spatial DFS order, so
    consecutive SUPER_FANOUT blocks are already compact."""
    F = SUPER_FANOUT
    S = -(-r.n_clusters // F)
    smin = np.stack([r.cmin[s * F:(s + 1) * F].min(0) for s in range(S)])
    smax = np.stack([r.cmax[s * F:(s + 1) * F].max(0) for s in range(S)])
    return smin.astype(np.float32), smax.astype(np.float32)


def _binned_bounds_np(r):
    """BINNED_FANOUT-granular blockwise bounds of a run: ([S,3] min,
    [S,3] max, [S,F,3] member min, [S,F,3] member max; NaN member pads
    — the DFS cluster order makes consecutive blocks compact, exactly
    like _super_bounds_np at the visit hierarchy's fanout)."""
    F = BINNED_FANOUT
    S = -(-r.n_clusters // F)
    pad = S * F - r.n_clusters
    cmin = np.concatenate(
        [r.cmin, np.full((pad, 3), np.nan, np.float32)])
    cmax = np.concatenate(
        [r.cmax, np.full((pad, 3), np.nan, np.float32)])
    mmin = cmin.reshape(S, F, 3)
    mmax = cmax.reshape(S, F, 3)
    smin = np.nanmin(mmin, axis=1).astype(np.float32)
    smax = np.nanmax(mmax, axis=1).astype(np.float32)
    return smin, smax, mmin.astype(np.float32), mmax.astype(np.float32)


def make_coherence_key(layout, cell_bits: int = 4, scheme: str = None):
    """Build key(o, d) -> uint32 coherence sort key for compaction.

    Secondary bounces scatter ray origins/directions across the packed
    wavefront, so a RAY_TILE-lane window overlaps almost every cluster
    (VERDICT r2 weak #3).  The compaction already pays a full lane
    permutation; ordering survivors by this key re-groups them so each
    tile's working set shrinks.  Key = origin Morton cell x direction
    octant; WHICH leads is measured per layout level (TPU v5e, 400x225x4
    depth 10, after the outlier-robust cell bounds below):

      66k flake (one-level, 256 clusters):  octant-first 0.466 Mrays/s
                                            vs cell-first 0.339-0.382
      598k flake (two-level, 2048 clusters): cell-first 0.153
                                            vs octant-first 0.133

    One-level tiles visit a modest cluster list where direction grouping
    buys earlier nearest-first termination; two-level tiles live or die
    by how few SUPERS they touch, which is a position property.  So:
    octant-first for one-level layouts, cell-first when any run is
    two-level.  Pure relabeling either way: per-ray RNG makes the sorted
    render bit-identical.
    """
    two_runs = [r for r in layout.runs
                if r.n_clusters >= SUPER_MIN_CLUSTERS]
    if scheme is None:
        scheme = "octant-cell"
    if scheme == "super" and two_runs:
        # Nearest-super key: group survivors by WHICH super-cluster box
        # their ray enters first (the largest two-level run's supers —
        # the boxes the visit loop actually walks), then by direction
        # octant, then Morton cell.  Keying on the working set itself
        # SOUNDED sharper than the Morton-cell proxy, but measured 6%
        # SLOWER on the 598k flake (0.148 vs 0.158 Mrays/s): the sid
        # order scatters lanes relative to launch order and the
        # compaction's row gathers pay the locality cliff
        # prof_compact.py measured — the same failure mode as the
        # round-4 super-overlap-mask sort, in milder form.  Kept as an
        # opt-in scheme for future retuning; NOT the default.  Still a
        # pure permutation: renders stay bit-identical.
        big_run = max(two_runs, key=lambda r: r.n_clusters)
        smin, smax = (jnp.asarray(b) for b in _super_bounds_np(big_run))
        S = smin.shape[0]
        sub = make_coherence_key(layout, cell_bits=3, scheme="octant-cell")

        def key(o, d):
            inv = 1.0 / d
            t0 = (smin[None] - o[:, None]) * inv[:, None]
            t1 = (smax[None] - o[:, None]) * inv[:, None]
            lo = jnp.minimum(t0, t1).max(-1)
            hi = jnp.maximum(t0, t1).min(-1)
            hit = hi > jnp.maximum(lo, jnp.float32(1e-3))
            entry = jnp.where(hit, lo, BIG)
            sid = jnp.argmin(entry, axis=1).astype(jnp.uint32)
            sid = jnp.where(hit.any(1), sid, jnp.uint32(S))
            return (sid << 12) | sub(o, d)  # sub: 3*3 cell + 3 octant

        return key

    octant_leads = not any(r.n_clusters >= SUPER_MIN_CLUSTERS
                           for r in layout.runs)
    if scheme == "octant-first":
        octant_leads = True
    elif scheme == "cell-first":
        octant_leads = False
    # Cell bounds from the TYPICAL clusters only: one outlier cluster (a
    # ground sphere sharing the type run — sphereflake: r=1000 in a
    # ~6-unit flake) would stretch the Morton grid 300x and collapse all
    # real geometry into a single cell, silently reducing the sort to its
    # direction-octant bits (found in round 4: cell_bits had no measured
    # effect on the 598k flake for exactly this reason).  Keep clusters
    # whose diagonal is within 8x the median diagonal; pure permutation
    # either way, so the only effect is sort quality.
    allmin = np.concatenate([r.cmin for r in layout.runs])
    allmax = np.concatenate([r.cmax for r in layout.runs])
    diag = np.linalg.norm(allmax - allmin, axis=-1)
    keep = diag <= 8.0 * max(float(np.median(diag)), 1e-20)
    if not keep.any():
        keep = np.ones_like(keep)
    bmin = allmin[keep].min(0)
    bmax = allmax[keep].max(0)
    n_cells = 1 << cell_bits
    scale = np.float32((n_cells - 1e-3) / np.maximum(bmax - bmin, 1e-20))
    bmin = np.float32(bmin)

    def key(o, d):
        q = jnp.clip((o - bmin) * scale, 0.0,
                     np.float32(n_cells - 1)).astype(jnp.uint32)
        m = jnp.zeros(o.shape[:-1], jnp.uint32)
        for b in range(cell_bits):
            m = m | (((q[..., 0] >> b) & 1) << (3 * b + 2)) \
                  | (((q[..., 1] >> b) & 1) << (3 * b + 1)) \
                  | (((q[..., 2] >> b) & 1) << (3 * b))
        oc = ((d[..., 0] < 0.0).astype(jnp.uint32) * 4
              + (d[..., 1] < 0.0).astype(jnp.uint32) * 2
              + (d[..., 2] < 0.0).astype(jnp.uint32))
        if octant_leads:
            return (oc << (3 * cell_bits)) | m
        return (m << 3) | oc

    return key


def _round8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


def make_cluster_intersector(static, layout):
    """Returns trace(geom, o, d, time, t_min, ray_bits, active) ->
    (t_best, best) over the padded cluster-order geometry ``layout``.

    No bf16 candidate mode here, by measurement (docs/DESIGN.md §14): a
    sphere's bf16 discriminant signal scales with (r/|oc|)^2, and the
    30k+-primitive scenes cluster mode exists for are exactly the many-
    small-spheres workloads where that rounds to zero — on the 598k
    sphereflake bf16 candidates ran 3.9x faster and MISSED whole spheres
    (mean radiance 1.886 -> 2.349), and no build-time gate can know the
    viewing distance.  The sweep keeps its opt-in bf16 (close/large-
    sphere scenes, drift-bounded by tests/test_bf16.py); cluster mode
    stays f32."""
    run_fns = [
        make_prim_intersector(static, types=r.types,
                              has_motion=r.has_motion,
                              has_xform=r.has_xform,
                              rect_axis=r.rect_axis, assume_pure=True)
        for r in layout.runs
    ]
    from .intersect import PT_SPHERE

    # Static no-xform sphere runs take the packed fast path: the visit
    # body slices ONE [n_slots, 4] (center, radius) matrix instead of all
    # 11 PrimFields arrays — the per-visit fixed cost (DMA descriptors)
    # was about half the cost of a 1024-lane visit before this.
    run_sphere = [
        r.types == {PT_SPHERE} and not r.has_motion and not r.has_xform
        for r in layout.runs
    ]
    tail_fns = [
        (s, w, make_prim_intersector(static, types=t, has_motion=m,
                                     has_xform=x, rect_axis=ra,
                                     assume_pure=True))
        for s, w, t, m, x, ra in layout.tail
    ]
    # Per run: one- or two-level culling metadata.  Two-level runs pad
    # the member-cluster bounds to S * FANOUT with NaN boxes (NaN slab
    # comparisons are False, so pad members never register as overlapped
    # — the same convention as pad primitive slots).
    two_level = [r.n_clusters >= SUPER_MIN_CLUSTERS for r in layout.runs]
    cluster_bounds = []
    super_bounds = []
    member_bounds = []
    for r, two in zip(layout.runs, two_level):
        if not two:
            cluster_bounds.append((jnp.asarray(r.cmin), jnp.asarray(r.cmax)))
            super_bounds.append(None)
            member_bounds.append(None)
            continue
        S = -(-r.n_clusters // SUPER_FANOUT)
        smin = np.stack([r.cmin[s * SUPER_FANOUT:(s + 1) * SUPER_FANOUT]
                         .min(0) for s in range(S)])
        smax = np.stack([r.cmax[s * SUPER_FANOUT:(s + 1) * SUPER_FANOUT]
                         .max(0) for s in range(S)])
        pad = S * SUPER_FANOUT - r.n_clusters
        mmin = np.concatenate(
            [r.cmin, np.full((pad, 3), np.nan, np.float32)])
        mmax = np.concatenate(
            [r.cmax, np.full((pad, 3), np.nan, np.float32)])
        cluster_bounds.append(None)
        super_bounds.append((jnp.asarray(smin.astype(np.float32)),
                             jnp.asarray(smax.astype(np.float32))))
        member_bounds.append((jnp.asarray(mmin), jnp.asarray(mmax)))

    def _tile_slice(geom, start, width):
        sl = [jax.lax.dynamic_slice_in_dim(getattr(geom, k), start,
                                           width, 0)[None]
              for k in PrimFields._fields]
        return PrimFields(*sl)

    def _fold(base_idx, t, t_best, best):
        # Strict < keeps the first-processed primitive on exact ties,
        # like the sequential list.rs scan (see module docstring).
        j = jnp.argmin(t, axis=1).astype(jnp.int32)
        tt = jnp.min(t, axis=1)
        upd = tt < t_best
        return jnp.where(upd, tt, t_best), jnp.where(upd, base_idx + j, best)

    def _fold_multi(starts, cw, t, t_best, best):
        """_fold over VISIT_WIDTH concatenated cluster tiles: the winner
        column maps back through its chunk's base.  argmin's first-
        occurrence rule keeps the earliest-entry cluster on exact ties,
        matching the sequential nearest-first processing order."""
        j = jnp.argmin(t, axis=1).astype(jnp.int32)
        tt = jnp.min(t, axis=1)
        upd = tt < t_best
        base = starts[j // cw] + (j % cw)
        return jnp.where(upd, tt, t_best), jnp.where(upd, base, best)

    def _cluster_t(hit_fn, kind, geom, sph, start, cw, ray_args, t_min,
                   t_best):
        """Candidate t of one cluster tile.

        kind: 'f32' (generic PrimFields path) or 'sphere' (packed
        [*, 4] static-sphere fast path — one dynamic_slice per visit,
        identical primal math to intersect.sphere_t)."""
        o_b, d_b, time_b, bits_b = ray_args[:4]
        if kind == "f32":
            pf = _tile_slice(geom, start, cw)
            return hit_fn(pf, o_b, d_b, time_b, t_min, t_best[:, None],
                          bits_b, jnp)
        pk = jax.lax.dynamic_slice_in_dim(sph, start, cw, 0)[None]
        center = pk[..., :3]  # [1, cw, 3]
        radius = pk[..., 3]  # [1, cw]
        # f32 sphere fast path — same formula as intersect._sphere_roots
        # (NaN pads: every comparison below is False, so pads never hit).
        a_l = ray_args[8]  # [tile, 1] = dot(d, d)
        oc = o_b - center
        half_b = (oc * d_b).sum(-1)
        c2 = (oc * oc).sum(-1) - radius * radius
        disc = half_b * half_b - a_l * c2
        exists = disc >= 0.0
        sq = jnp.sqrt(jnp.where(exists, jnp.maximum(disc, 1e-30), 1.0))
        t_near = (-half_b - sq) / a_l
        t_far = (-half_b + sq) / a_l
        t_max = t_best[:, None]
        ok1 = exists & (t_near >= t_min) & (t_near <= t_max)
        ok2 = exists & (t_far >= t_min) & (t_far <= t_max)
        return jnp.where(ok1, t_near, jnp.where(ok2, t_far, BIG))

    def _tile_cull(bmin, bmax, o_l, inv_l, act_l, t_min, t_best):
        """Per-tile, t_best-aware box culling: entry t per box, BIG for
        boxes NO lane can still improve.

        The per-lane test ``lo < t_best[lane]`` is the lane-granular cull
        (docs/DESIGN.md §14's "honest next structural step"): a lane that
        already holds a nearer hit — or a miss-bound lane that simply
        does not overlap the box — cannot force a visit.  Because t_best
        only shrinks during the visit loops, a box filtered here can
        never improve any lane later, so dropping it leaves the strict-<
        fold's result unchanged (not even exact-t ties move).  Running
        this INSIDE the tile body (after the always-on tail pinned e.g.
        the ground-sphere t) is what makes it sharp; the old global
        Phase A ran before any t_best existed and could only test
        geometric overlap."""
        t0 = (bmin[None] - o_l[:, None]) * inv_l[:, None]
        t1 = (bmax[None] - o_l[:, None]) * inv_l[:, None]
        lo = jnp.minimum(t0, t1).max(-1)
        hi = jnp.maximum(t0, t1).min(-1)
        hit = ((hi > jnp.maximum(lo, t_min)) & (lo < t_best[:, None])
               & act_l[:, None])
        entry = jnp.where(hit, lo, BIG).min(0)  # [C]
        order = jnp.argsort(entry).astype(jnp.int32)
        entry_sorted = jnp.sort(entry)
        count = (entry_sorted < jnp.float32(0.5) * BIG).sum(
            dtype=jnp.int32)
        return order, count, entry_sorted

    def _make_run_loop(run, hit_fn, cb, kind):
        cw = run.width
        cmin, cmax = cb

        def run_loop(geom, sph, ray_args, t_min, k0, t_best, best):
            o_l, inv_l, act_l = ray_args[4:7]
            order, count, entry_sorted = _tile_cull(
                cmin, cmax, o_l, inv_l, act_l, t_min, t_best)
            KV = min(VISIT_WIDTH, run.n_clusters)

            def cond(carry):
                k, t_best, _ = carry
                # Next-nearest cluster starts beyond every lane's best hit
                # -> no remaining cluster can improve anything (entries are
                # sorted ascending and the fold is strict <).
                return (k < count) & (entry_sorted[k] < t_best.max())

            def body(carry):
                k, t_best, best = carry
                # KV nearest-first clusters per trip (VISIT_WIDTH notes);
                # trailing indices clip to the last in-range cluster —
                # refolding an already-processed cluster is a no-op under
                # the strict-< fold.
                idxs = jnp.clip(k + jnp.arange(KV), 0, count - 1)
                starts = run.base + order[idxs] * cw
                t = jnp.concatenate(
                    [_cluster_t(hit_fn, kind, geom, sph, starts[j], cw,
                                ray_args, t_min, t_best)
                     for j in range(KV)], axis=1)
                t_best, best = _fold_multi(starts, cw, t, t_best, best)
                return k + KV, t_best, best

            _, t_best, best = jax.lax.while_loop(
                cond, body, (k0, t_best, best))
            return t_best, best

        return run_loop

    def _make_run_loop2(run, hit_fn, sb, mb, kind, fanout=None):
        """Two-level visit loop: outer over SUPER-clusters nearest-first,
        inner over each super's member clusters nearest-first.  Pure
        pruning — a super (or member) is skipped only when no lane's
        current best can still be improved by it (lane-granular, see
        _tile_cull), which cannot change any lane's strict-< closest-hit
        fold; visit ORDER differs from the flat sorted order only across
        supers, which affects exact-t ties alone (image-equivalent, see
        module docstring)."""
        cw = run.width
        smin, smax = sb
        mmin, mmax = mb
        F = SUPER_FANOUT if fanout is None else fanout

        def run_loop(geom, sph, ray_args, t_min, k0, t_best, best):
            o_l, inv_l, act_l = ray_args[4:7]
            order_s, count_s, entry_s = _tile_cull(
                smin, smax, o_l, inv_l, act_l, t_min, t_best)

            def cond_s(carry):
                k, t_best, _ = carry
                return (k < count_s) & (entry_s[k] < t_best.max())

            def body_s(carry):
                k, t_best, best = carry
                s = order_s[k]
                # Member-cluster slab tests for this tile: [tile, F].
                bmin = jax.lax.dynamic_slice_in_dim(mmin, s * F, F, 0)
                bmax = jax.lax.dynamic_slice_in_dim(mmax, s * F, F, 0)
                t0 = (bmin[None] - o_l[:, None]) * inv_l[:, None]
                t1 = (bmax[None] - o_l[:, None]) * inv_l[:, None]
                lo = jnp.minimum(t0, t1).max(-1)
                hi = jnp.maximum(t0, t1).min(-1)
                hit = ((hi > jnp.maximum(lo, t_min)) & (lo < t_best[:, None])
                       & act_l[:, None])
                entry_f = jnp.where(hit, lo, BIG).min(0)  # [F]
                order_f = jnp.argsort(entry_f).astype(jnp.int32)
                entry_fs = jnp.sort(entry_f)
                count_f = (entry_fs < jnp.float32(0.5) * BIG).sum(
                    dtype=jnp.int32)

                KV = min(VISIT_WIDTH, F)

                def cond_f(c2):
                    k2, tb2, _ = c2
                    return (k2 < count_f) & (entry_fs[k2] < tb2.max())

                def body_f(c2):
                    k2, tb2, bb2 = c2
                    # KV nearest-first member clusters per trip
                    # (VISIT_WIDTH notes); trailing indices clip to the
                    # last in-range member — a refold is a no-op under
                    # the strict-< fold.
                    idxs = jnp.clip(k2 + jnp.arange(KV), 0, count_f - 1)
                    cis = s * F + order_f[idxs]
                    starts = run.base + cis * cw
                    t = jnp.concatenate(
                        [_cluster_t(hit_fn, kind, geom, sph, starts[j],
                                    cw, ray_args, t_min, tb2)
                         for j in range(KV)], axis=1)
                    tb2, bb2 = _fold_multi(starts, cw, t, tb2, bb2)
                    return k2 + KV, tb2, bb2

                _, t_best, best = jax.lax.while_loop(
                    cond_f, body_f, (k * 0, t_best, best))
                return k + 1, t_best, best

            _, t_best, best = jax.lax.while_loop(
                cond_s, body_s, (k0, t_best, best))
            return t_best, best

        return run_loop

    def _make_binned_pass(run, kind, hit_fn, keep):
        """SUPER-BINNED pass over one two-level run (BINNED_SECONDARY
        notes): rays are re-tiled by super membership — one bin row per
        (lane, super) overlap pair — so each super's folds touch only
        lanes that genuinely overlap it and only its own member
        clusters.  Sequential supers carry (t_best, best) through the
        scan (scatter-merge per bin tile; bin rows are unique within a
        super, so the scatters declare unique indices).  Returns the
        per-lane ``over`` mask of lanes that had a pair dropped by the
        static bin capacity — the caller re-traces exactly those lanes
        with the original union loop (correctness never depends on the
        capacity).

        ``keep`` ([S] bool, host): supers binned here.  OUTLIER supers
        (box diagonal > 8x the median — e.g. the super holding the
        flake's r=1000 ground sphere, whose box covers the whole scene
        and would put ~77% of all lanes in one overflowing bin) are
        excluded at build time; the caller sweeps them per-tile in
        phase 1, which also pins their t_best BEFORE the binning cull
        (the ground hit is what lets miss-bound lanes skip bins)."""
        cw = run.width
        F = BINNED_FANOUT
        smin_a, smax_a, mminp, mmaxp = _binned_bounds_np(run)
        keep_ids = np.flatnonzero(keep)
        S = int(keep_ids.shape[0])
        smin = jnp.asarray(smin_a[keep_ids])
        smax = jnp.asarray(smax_a[keep_ids])
        mminr = jnp.asarray(mminp[keep_ids])
        mmaxr = jnp.asarray(mmaxp[keep_ids])
        base_s = jnp.asarray(
            (run.base + keep_ids.astype(np.int64) * F * cw)
            .astype(np.int32))

        def binned_pass(geom, sph, o, d, time, bits, active, t_min,
                        t_best, best):
            n = o.shape[0]
            # GLOBAL-CONTIGUOUS pair buffer: supers' bins are laid out
            # back to back at their true (dynamic) offsets, so a skewed
            # super can fill as much of the buffer as it needs — the
            # measured flake skew (one central super holding 2/3 of all
            # pairs) overflowed per-super fixed caps at any sane factor.
            # Capacity is pairs-per-lane: overflow only when the MEAN
            # kept-super overlap exceeds BINNED_CAP_FACTOR (measured
            # 2-4 on the flake's real wavefronts).
            cap_total = max(BIN_TILE,
                            -(-(BINNED_CAP_FACTOR * n) // BIN_TILE)
                            * BIN_TILE)
            inv = 1.0 / d
            # t_best-aware super cull, [n, S] pure VPU (the same
            # lane-granular test as _tile_cull, at super granularity).
            t0 = (smin[None] - o[:, None]) * inv[:, None]
            t1 = (smax[None] - o[:, None]) * inv[:, None]
            lo = jnp.minimum(t0, t1).max(-1)
            hi = jnp.maximum(t0, t1).min(-1)
            ovl = ((hi > jnp.maximum(lo, t_min))
                   & (lo < t_best[:, None]) & active[:, None])
            # Rank within super: one [n, S] axis-0 cumsum (measured as
            # cheap as a single [n] cumsum — the scan dependency is
            # along n, the S columns ride the VPU lanes).
            cum = jnp.cumsum(ovl.astype(jnp.int32), axis=0)
            counts = cum[-1]  # [S]
            offs = jnp.concatenate(
                [jnp.zeros(1, jnp.int32),
                 jnp.cumsum(counts)[:-1].astype(jnp.int32)])
            rank = cum - 1
            dest = offs[None] + rank
            okp = ovl & (dest < cap_total)
            over = (ovl & ~okp).any(axis=1)
            lane = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[:, None], (n, S))
            # One bit-safe packed ray matrix for the bin-tile gathers:
            # int32 with the f32 columns bitcast in — 1 row gather per
            # tile instead of 4, and exact under any GSPMD masked-sum
            # decomposition (render._packed_take's story; traversal is
            # under stop_gradient, so no VJP is needed here).
            _f2i = lambda a: jax.lax.bitcast_convert_type(  # noqa: E731
                a, jnp.int32)
            rpk = jnp.concatenate(
                [_f2i(o), _f2i(d), _f2i(time)[:, None],
                 jax.lax.bitcast_convert_type(bits, jnp.int32)[:, None]],
                axis=-1)  # [n, 8]
            _i2f = lambda a: jax.lax.bitcast_convert_type(  # noqa: E731
                a, jnp.float32)
            # Pad the buffer by one tile so per-super dynamic_slice
            # windows never clamp (clamping would shift rows under the
            # position mask).
            bins = (
                jnp.full(cap_total + BIN_TILE, -1, jnp.int32)
                .at[jnp.where(okp, dest, cap_total + BIN_TILE)
                    .reshape(-1)]
                .set(lane.reshape(-1), mode="drop", unique_indices=True)
            )

            def super_body(carry, xs):
                t_best, best = carry
                mmin_s, mmax_s, bs, off_s, cnt_s = xs
                cnt_eff = jnp.clip(jnp.minimum(cnt_s, cap_total - off_s),
                                   0)
                trips = -(-cnt_eff // BIN_TILE)

                def cond2(c2):
                    return c2[0] < trips

                def tile_body(c2):
                    k, t_best, best = c2
                    pos0 = off_s + k * BIN_TILE
                    bt = jax.lax.dynamic_slice_in_dim(
                        bins, pos0, BIN_TILE, 0)
                    val = ((k * BIN_TILE
                            + jnp.arange(BIN_TILE, dtype=jnp.int32)
                            < cnt_eff) & (bt >= 0))
                    idxc = jnp.maximum(bt, 0)
                    rows = rpk[idxc]
                    o_l = _i2f(rows[:, 0:3])
                    d_l = _i2f(rows[:, 3:6])
                    time_l = _i2f(rows[:, 6])
                    bits_l = jax.lax.bitcast_convert_type(
                        rows[:, 7], jnp.uint32)
                    inv_l = 1.0 / d_l
                    tb = jnp.where(val, t_best[idxc],
                                   jnp.float32(-BIG))
                    bb = best[idxc]
                    o_b = o_l[:, None, :]
                    d_b = d_l[:, None, :]
                    a_l = (d_l * d_l).sum(-1)[:, None]
                    ray_args = (o_b, d_b, time_l[:, None],
                                bits_l[:, None], o_l, inv_l, val, None,
                                a_l)
                    # Member-cluster cull within this super.
                    t0 = (mmin_s[None] - o_l[:, None]) * inv_l[:, None]
                    t1 = (mmax_s[None] - o_l[:, None]) * inv_l[:, None]
                    lo = jnp.minimum(t0, t1).max(-1)
                    hi = jnp.maximum(t0, t1).min(-1)
                    h = ((hi > jnp.maximum(lo, t_min))
                         & (lo < tb[:, None]) & val[:, None])
                    entry = jnp.where(h, lo, BIG).min(0)  # [F]
                    order_f = jnp.argsort(entry).astype(jnp.int32)
                    entry_s = jnp.sort(entry)
                    count = (entry_s < jnp.float32(0.5) * BIG).sum(
                        dtype=jnp.int32)

                    def cond3(c3):
                        kk, tb3, _ = c3
                        return (kk < count) & (entry_s[kk] < tb3.max())

                    def body3(c3):
                        kk, tb3, bb3 = c3
                        start = bs + order_f[kk] * cw
                        t = _cluster_t(hit_fn, kind, geom, sph, start,
                                       cw, ray_args, t_min, tb3)
                        tb3, bb3 = _fold(start, t, tb3, bb3)
                        return kk + 1, tb3, bb3

                    _, tb, bb = jax.lax.while_loop(
                        cond3, body3, (count * 0, tb, bb))
                    # Scatter-merge (rows unique within the super bin;
                    # pads/masked rows routed to the dropped slot n).
                    sidx = jnp.where(val, bt, n)
                    upd = val & (tb < t_best[idxc])
                    t_new = jnp.where(upd, tb, t_best[idxc])
                    b_new = jnp.where(upd, bb, best[idxc])
                    t_best = t_best.at[sidx].set(
                        t_new, mode="drop", unique_indices=True)
                    best = best.at[sidx].set(
                        b_new, mode="drop", unique_indices=True)
                    return k + 1, t_best, best

                _, t_best, best = jax.lax.while_loop(
                    cond2, tile_body, (jnp.int32(0), t_best, best))
                return (t_best, best), None

            (t_best, best), _ = jax.lax.scan(
                super_body, (t_best, best),
                (mminr, mmaxr, base_s, offs, counts))
            return t_best, best, over

        return binned_pass

    run_kinds = ["sphere" if sph else "f32" for sph in run_sphere]
    run_loops = [
        _make_run_loop2(r, fn, sb, mb, kd) if two
        else _make_run_loop(r, fn, cb, kd)
        for r, fn, two, cb, sb, mb, kd in zip(
            layout.runs, run_fns, two_level, cluster_bounds,
            super_bounds, member_bounds, run_kinds)
    ]
    any_sphere = any(k != "f32" for k in run_kinds)

    # Two-level static-sphere runs take the super-binned pass
    # (BINNED_SECONDARY notes); their union loop stays built as the
    # exact residual for bin-capacity overflow lanes.  OUTLIER supers
    # (diag > 8x median — the outlier-robust bound trick from
    # make_coherence_key, same root cause: a giant ground sphere in the
    # run) stay on the per-tile path in phase 1, where their early hit
    # also tightens t_best before the binning cull.
    binned_i = []
    binned_passes = []
    outlier_loops = []
    for i, (two, kd) in enumerate(zip(two_level, run_kinds)):
        if not (BINNED_SECONDARY and two and kd == "sphere"):
            continue
        smin_a, smax_a, mminp, mmaxp = _binned_bounds_np(layout.runs[i])
        diag = np.linalg.norm(smax_a - smin_a, axis=1)
        keep = diag <= 8.0 * max(float(np.median(diag)), 1e-30)
        if not keep.any():
            continue
        binned_i.append(i)
        binned_passes.append(_make_binned_pass(
            layout.runs[i], run_kinds[i], run_fns[i], keep))
        if not keep.all():
            # Per-tile loop over ONLY the outlier binning-supers: the
            # kept supers' boxes are NaN-poisoned, so _tile_cull never
            # visits them here (same granularity as the binning —
            # BINNED_FANOUT — so exclusion and binning partition the
            # clusters exactly).
            nan3 = np.full((1, 3), np.nan, np.float32)
            so = (jnp.asarray(np.where(keep[:, None], nan3, smin_a)),
                  jnp.asarray(np.where(keep[:, None], nan3, smax_a)))
            mo = (jnp.asarray(mminp.reshape(-1, 3)),
                  jnp.asarray(mmaxp.reshape(-1, 3)))
            outlier_loops.append(_make_run_loop2(
                layout.runs[i], run_fns[i], so, mo,
                run_kinds[i], fanout=BINNED_FANOUT))
    main_loops = [loop for i, loop in enumerate(run_loops)
                  if i not in binned_i] + outlier_loops
    resid_loops = [run_loops[i] for i in binned_i]

    def trace(geom, o, d, time, t_min, ray_bits, active, secondary=None):
        """``secondary``: traced bool (or None = True) — binned
        membership re-tiling pays off on INCOHERENT rays; camera
        bounces (coherent image-block tiles share their cluster working
        set) measured 2.3x faster on the union path, so bounce_step
        passes ``bounce_idx > 0``.  A traced flag (lax.cond over the
        two phase-2/3 forms) keeps every caller — probe, scheduled
        segments, plain scan — compiling the SAME program, so
        scheduled-vs-counted bit-identity cannot depend on which
        variant a segment picked."""
        n = o.shape[0]
        pref = RAY_TILE_TWO_LEVEL if any(two_level) else RAY_TILE
        tile = pref if n >= pref else _round8(n)
        n_pad = -(-n // tile) * tile
        t_tiles = n_pad // tile
        if n_pad != n:
            extra = n_pad - n

            def pad(x, fill):
                widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
                return jnp.pad(x, widths, constant_values=fill)

            o = pad(o, 0.0)
            d = pad(d, 1.0)  # non-zero: keeps 1/d finite on pad lanes
            time = pad(time, 0.0)
            ray_bits = pad(ray_bits, 0)
            active = pad(active, False)

        # Packed static-sphere matrix for the fast visit path (loop-
        # invariant: XLA hoists it out of the tile scan).
        sph = None
        if any_sphere:
            sph = jnp.concatenate([geom.p0, geom.radius[:, None]],
                                  axis=-1)

        # Box culling happens INSIDE the tile body (per run, after the
        # always-on tail and any preceding runs tightened t_best), so the
        # per-lane ``lo < t_best`` test is live — see _tile_cull.  The old
        # global Phase A (a dense [N, C] slab pass before the scan) knew
        # no t_best and culled on geometric overlap alone: on the 598k
        # flake ~55% of post-bounce-0 lanes are miss-bound and forced
        # every overlapped super to be visited (docs/DESIGN.md §14).
        def tile_sweep(loops, include_tail, act_flat, tb0, bb0):
            """One per-tile culled sweep over ``loops``; carries in the
            per-lane (t_best, best) from earlier phases and returns the
            merged flat result (lanes inactive IN THIS PHASE keep their
            carried values)."""
            xs = (
                o.reshape(t_tiles, tile, 3),
                d.reshape(t_tiles, tile, 3),
                time.reshape(t_tiles, tile),
                ray_bits.reshape(t_tiles, tile),
                act_flat.reshape(t_tiles, tile),
                tb0.reshape(t_tiles, tile),
                bb0.reshape(t_tiles, tile),
            )

            def tile_body(_, xs_t):
                o_l, d_l, time_l, bits_l, act_l, tb_l, bb_l = xs_t
                o_b = o_l[:, None, :]
                d_b = d_l[:, None, :]
                time_b = time_l[:, None]
                bits_b = bits_l[:, None]
                a_l = (d_l * d_l).sum(-1)[:, None]  # [tile, 1]
                ray_args = (o_b, d_b, time_b, bits_b, o_l, 1.0 / d_l,
                            act_l, None, a_l)
                # Device-varying inits (shard_map-safe); inactive lanes
                # pinned at -BIG so nothing can beat them and they never
                # inflate the early-termination max.
                t_best = jnp.where(act_l, tb_l + o_l[:, 0] * 0.0,
                                   jnp.float32(-BIG))
                best = bb_l
                k0 = jnp.int32(0) * best[0]

                if include_tail:
                    # Always-on tail first: cheap, and a tight initial
                    # t_best lets the cluster loops terminate earlier.
                    for s, w, fn in tail_fns:
                        pf = _tile_slice(geom, s, w)
                        t = fn(pf, o_b, d_b, time_b, t_min,
                               t_best[:, None], bits_b, jnp)
                        t_best, best = _fold(s, t, t_best, best)

                for loop in loops:
                    t_best, best = loop(geom, sph, ray_args, t_min, k0,
                                        t_best, best)
                t_best = jnp.where(act_l, t_best, tb_l)
                best = jnp.where(act_l, best, bb_l)
                return None, (t_best, best)

            _, (tb, bb) = jax.lax.scan(tile_body, None, xs)
            return tb.reshape(n_pad), bb.reshape(n_pad)

        # Device-varying inits (shard_map-safe: a replicated constant
        # carry would mismatch the loops' varying outputs under manual
        # sharding — the VMA lattice): derive both from ray data.
        tb = jnp.where(active, jnp.float32(BIG) + o[:, 0] * 0.0,
                       jnp.float32(-BIG))
        bb = active.astype(jnp.int32) * 0 - 1
        # Phase 1: tail + every non-binned run (including the outlier
        # supers of binned runs), in launch-tile order.
        tb, bb = tile_sweep(main_loops, True, active, tb, bb)
        if binned_passes:
            if secondary is None:
                secondary = jnp.bool_(True)

            def _binned(args):
                tb, bb = args
                # Phase 2: super-binned passes (membership re-tiling).
                over_any = jnp.zeros(n_pad, bool)
                for bp in binned_passes:
                    tb, bb, over = bp(geom, sph, o, d, time, ray_bits,
                                      active, t_min, tb, bb)
                    over_any = over_any | over
                # Phase 3: exact residual — lanes whose pairs
                # overflowed the buffer re-run the ORIGINAL union loop
                # (with phase-2 t_best, so it is pure tightening).
                # All-inactive tiles cull to zero visits and cost only
                # the slab math.
                res_act = active & over_any
                return tile_sweep(resid_loops, False, res_act, tb, bb)

            def _union(args):
                tb, bb = args
                return tile_sweep(resid_loops, False, active, tb, bb)

            tb, bb = jax.lax.cond(secondary, _binned, _union, (tb, bb))

        t_best = jnp.where(active[:n], tb[:n], BIG)
        return t_best, bb[:n]

    return trace
