"""Tile-culled cluster sweep: the cluster-pruned dense intersector.

This is the TPU-native analogue of the pruning the reference gets from its
BVH (`/root/reference/src/hittable/bvh_node.rs:104-127`), engineered around
the two measured pathologies of this machine (docs/DESIGN.md §1):
per-element gathers (~1.8 ns/elem) and lockstep divergence.

Shape of the algorithm (validated by prototype, tools/proto_cluster.py —
the scan-over-ray-tiles machinery runs *faster* than one monolithic
broadcast even at equal pair counts, and the win scales linearly with the
culled fraction):

1. Phase A (dense, batched over all rays): slab-test every ray against
   every cluster AABB ([N, C] pure VPU math, zero gathers).  Reduce per
   ray-tile of ``RAY_TILE`` lanes: which clusters does ANY lane overlap,
   and at what minimum entry t.  Sort each tile's clusters by entry t.

2. Phase B (``lax.scan`` over ray-tiles): each tile first sweeps the small
   always-on tail (media, lights, feature objects), then runs one dynamic-
   trip ``lax.while_loop`` per cluster run, visiting only the clusters the
   tile overlaps, nearest first.  Cluster primitives arrive via a
   contiguous static-width ``dynamic_slice`` — never a gather.  The loop
   exits early once the next cluster's entry t lies beyond every lane's
   current best hit (the vectorised equivalent of the reference's
   t_max-clamped ordered descent).

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

# Rays per tile: large enough to amortise per-cluster loop overhead
# (~2048 x 128 pair sweeps take ~20 us), small enough that an image-block
# of rays shares most of its cluster set.  Prototype-measured flat
# 1024..4096 on TPU v5e.
RAY_TILE = 2048


def make_coherence_key(layout, cell_bits: int = 4):
    """Build key(o, d) -> uint32 coherence sort key for compaction.

    Secondary bounces scatter ray origins/directions across the packed
    wavefront, so a RAY_TILE-lane window overlaps almost every cluster
    (VERDICT r2 weak #3).  The compaction already pays a full lane
    permutation; ordering survivors by this key re-groups them so each
    tile's working set shrinks: origin Morton cell (over the union of
    the CLUSTER bounds — the ground sphere would blow up a whole-scene
    box) in the high bits, direction octant in the low bits.  Position
    leads because the nearest sub-flake dominates a lane's cluster set;
    the octant then splits front/back-facing lanes within a cell
    (ordering measured in tools/prof_coherence.py).  Pure relabeling:
    per-ray RNG makes the sorted render bit-identical.
    """
    bmin = np.min([r.cmin.min(0) for r in layout.runs], axis=0)
    bmax = np.max([r.cmax.max(0) for r in layout.runs], axis=0)
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
        return (m << 3) | oc

    return key


def _round8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


def make_cluster_intersector(static, layout):
    """Returns trace(geom, o, d, time, t_min, ray_bits, active) ->
    (t_best, best) over the padded cluster-order geometry ``layout``."""
    run_fns = [
        make_prim_intersector(static, types=r.types,
                              has_motion=r.has_motion,
                              has_xform=r.has_xform,
                              rect_axis=r.rect_axis, assume_pure=True)
        for r in layout.runs
    ]
    tail_fns = [
        (s, w, make_prim_intersector(static, types=t, has_motion=m,
                                     has_xform=x, rect_axis=ra,
                                     assume_pure=True))
        for s, w, t, m, x, ra in layout.tail
    ]
    cluster_bounds = [(jnp.asarray(r.cmin), jnp.asarray(r.cmax))
                      for r in layout.runs]

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

    def _make_run_loop(run, hit_fn):
        cw = run.width

        def run_loop(geom, order, count, entry_sorted, o_b, d_b, time_b,
                     bits_b, t_min, k0, t_best, best):
            def cond(carry):
                k, t_best, _ = carry
                # Next-nearest cluster starts beyond every lane's best hit
                # -> no remaining cluster can improve anything (entries are
                # sorted ascending and the fold is strict <).
                return (k < count) & (entry_sorted[k] < t_best.max())

            def body(carry):
                k, t_best, best = carry
                start = run.base + order[k] * cw
                pf = _tile_slice(geom, start, cw)
                t = hit_fn(pf, o_b, d_b, time_b, t_min, t_best[:, None],
                           bits_b, jnp)
                t_best, best = _fold(start, t, t_best, best)
                return k + 1, t_best, best

            _, t_best, best = jax.lax.while_loop(
                cond, body, (k0, t_best, best))
            return t_best, best

        return run_loop

    run_loops = [_make_run_loop(r, fn)
                 for r, fn in zip(layout.runs, run_fns)]

    def trace(geom, o, d, time, t_min, ray_bits, active):
        n = o.shape[0]
        tile = RAY_TILE if n >= RAY_TILE else _round8(n)
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

        # ---- Phase A: cluster slab tests + per-tile sort.  Two forms of
        # the same math: DENSE ([N, C] in one shot — fastest while the
        # transient fits comfortably) and PER-TILE (a lax.map over ray
        # tiles, [tile, C] transients) for the big-C regime the 4096
        # cluster cap allows (models/clusters.py) — the dense form at
        # 360k rays x 4096 clusters would materialise multi-GB arrays.
        c_total = sum(cm.shape[0] for cm, _ in cluster_bounds)
        dense_a = n_pad * max(c_total, 1) <= (1 << 28)

        def _phase_a(args):
            o_l, d_l, act_l = args  # [tile(s), 3] / [tile(s)]
            inv = 1.0 / d_l
            outs = []
            for (cmin, cmax) in cluster_bounds:
                t0 = (cmin[None] - o_l[:, None]) * inv[:, None]
                t1 = (cmax[None] - o_l[:, None]) * inv[:, None]
                lo = jnp.minimum(t0, t1).max(-1)
                hi = jnp.maximum(t0, t1).min(-1)
                hit = (hi > jnp.maximum(lo, t_min)) & act_l[:, None]
                outs.append(jnp.where(hit, lo, BIG))  # [tile(s), C]
            return tuple(outs)

        if dense_a:
            entries_n = _phase_a((o, d, active))  # [N, C] per run
            tile_entries = tuple(
                e.reshape(t_tiles, tile, -1).min(1) for e in entries_n)
        else:
            def _tile_a(args):
                return tuple(e.min(0) for e in _phase_a(args))

            tile_entries = jax.lax.map(_tile_a, (
                o.reshape(t_tiles, tile, 3),
                d.reshape(t_tiles, tile, 3),
                active.reshape(t_tiles, tile),
            ))
        run_xs = []
        for tile_entry in tile_entries:  # [T, C] per run
            order = jnp.argsort(tile_entry, axis=1).astype(jnp.int32)
            entry_sorted = jnp.take_along_axis(tile_entry, order, axis=1)
            count = (entry_sorted < jnp.float32(0.5) * BIG).sum(
                1, dtype=jnp.int32)
            run_xs.append((order, count, entry_sorted))

        xs = (
            o.reshape(t_tiles, tile, 3),
            d.reshape(t_tiles, tile, 3),
            time.reshape(t_tiles, tile),
            ray_bits.reshape(t_tiles, tile),
            active.reshape(t_tiles, tile),
            tuple(run_xs),
        )

        # ---- Phase B: per-tile culled sweeps.
        def tile_body(_, xs_t):
            o_l, d_l, time_l, bits_l, act_l, rxs = xs_t
            o_b = o_l[:, None, :]
            d_b = d_l[:, None, :]
            time_b = time_l[:, None]
            bits_b = bits_l[:, None]
            # Device-varying inits (shard_map-safe); inactive lanes pinned
            # at -BIG so nothing can beat them and they never inflate the
            # early-termination max.
            t_best = jnp.where(act_l, BIG + o_l[:, 0] * 0.0,
                               jnp.float32(-BIG))
            best = act_l.astype(jnp.int32) * 0 - 1
            k0 = best[0] * 0

            # Always-on tail first: cheap, and a tight initial t_best lets
            # the cluster loops terminate earlier.
            for s, w, fn in tail_fns:
                pf = _tile_slice(geom, s, w)
                t = fn(pf, o_b, d_b, time_b, t_min, t_best[:, None],
                       bits_b, jnp)
                t_best, best = _fold(s, t, t_best, best)

            for loop, (order, count, entry_sorted) in zip(run_loops, rxs):
                t_best, best = loop(geom, order, count, entry_sorted,
                                    o_b, d_b, time_b, bits_b, t_min,
                                    k0, t_best, best)
            return None, (t_best, best)

        _, (tb, bb) = jax.lax.scan(tile_body, None, xs)
        t_best = tb.reshape(n_pad)[:n]
        best = bb.reshape(n_pad)[:n]
        t_best = jnp.where(active[:n], t_best, BIG)
        return t_best, best

    return trace
