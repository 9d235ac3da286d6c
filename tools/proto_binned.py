"""Prototype: SUPER-BINNED secondary-ray traversal (VERDICT r4 task 4).

The committed cluster sweep tiles rays in launch order; a tile's visit
list is the UNION of its lanes' cluster overlaps, and incoherent
secondary bounces pay that union (docs/DESIGN.md §14/§18 — the measured
wall at 598k-1M prims).  This prototype re-tiles rays BY SUPER-CLUSTER
MEMBERSHIP instead: every (lane, super) overlap pair becomes one bin
row, each super's bin folds only over that super's member clusters, and
a scatter-merge carries (t_best, best) between supers — so no lane ever
visits a cluster that only its tile-mates overlap.

Synthetic K-sphere scene (prof_sec1m's rig), uniform coherence-SORTED
secondary rays — the operative workload.  Measures the full binned
pipeline on device (super cull + bin build + per-super folds + merges)
against the committed intersector.

Usage: python -m tools.proto_binned [K] [cap_slack]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu.models.clusters import build_clusters
from hyper_ray_tracer_tpu.ops.cluster_sweep import (
    SUPER_FANOUT,
    make_cluster_intersector,
    make_coherence_key,
)
from hyper_ray_tracer_tpu.ops.intersect import BIG, PT_SPHERE
from hyper_ray_tracer_tpu.render import T_MIN
from tools.prof_sec1m import bench, make_big_scene

N = 400 * 225
BIN_TILE = 1024


def make_binned_trace(geom, layout, cap: int):
    """trace(o, d, active, t_best0, best0) -> (t_best, best) via
    super-membership binning.  ``cap`` (static) = max bin rows per
    super; overflow lanes are silently dropped (prototype — production
    would carry the usual overflow flag + re-probe)."""
    [run] = [r for r in layout.runs]
    assert run.types == {PT_SPHERE} and not run.has_motion \
        and not run.has_xform
    F = SUPER_FANOUT
    S = -(-run.n_clusters // F)
    cw = run.width
    smin = jnp.asarray(np.stack(
        [run.cmin[s * F:(s + 1) * F].min(0) for s in range(S)]))
    smax = jnp.asarray(np.stack(
        [run.cmax[s * F:(s + 1) * F].max(0) for s in range(S)]))
    pad = S * F - run.n_clusters
    mmin = jnp.asarray(np.concatenate(
        [run.cmin, np.full((pad, 3), np.nan, np.float32)]).reshape(S, F, 3))
    mmax = jnp.asarray(np.concatenate(
        [run.cmax, np.full((pad, 3), np.nan, np.float32)]).reshape(S, F, 3))
    sph = jnp.concatenate([geom.p0, geom.radius[:, None]], axis=-1)
    n_tiles = -(-cap // BIN_TILE)
    cap_pad = n_tiles * BIN_TILE

    def trace(o, d, active, t_best0, best0):
        n = o.shape[0]
        inv = 1.0 / d
        # ---- super cull, t_best-aware ([N, S] pure VPU).
        t0 = (smin[None] - o[:, None]) * inv[:, None]
        t1 = (smax[None] - o[:, None]) * inv[:, None]
        lo = jnp.minimum(t0, t1).max(-1)
        hi = jnp.maximum(t0, t1).min(-1)
        ovl = ((hi > jnp.maximum(lo, T_MIN)) & (lo < t_best0[:, None])
               & active[:, None])  # [N, S]
        # ---- bin build: rank within super via one [N, S] axis-0 cumsum.
        rank = jnp.cumsum(ovl.astype(jnp.int32), axis=0) - 1
        ok = ovl & (rank < cap)
        dest = jnp.where(
            ok, jnp.arange(S, dtype=jnp.int32)[None] * cap_pad + rank,
            S * cap_pad)
        lane = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, S))
        binids = (
            jnp.full(S * cap_pad, -1, jnp.int32)
            .at[dest.reshape(-1)]
            .set(lane.reshape(-1), mode="drop", unique_indices=True)
            .reshape(S, n_tiles, BIN_TILE)
        )

        # ---- per-super folds, sequential scan (t_best flows between
        # supers through the carry).
        def super_body(carry, xs):
            t_best, best = carry
            bids, mmin_s, mmax_s, base_s = xs

            def tile_body(carry2, bt):
                t_best, best = carry2
                idx = bt
                val = idx >= 0
                idxc = jnp.maximum(idx, 0)
                o_l = o[idxc]
                d_l = d[idxc]
                tb = jnp.where(val, t_best[idxc], jnp.float32(-BIG))
                bb = best[idxc]
                o_b = o_l[:, None, :]
                d_b = d_l[:, None, :]
                a_l = (d_l * d_l).sum(-1)[:, None]
                inv_l = 1.0 / d_l
                # member-cluster cull within the super
                t0 = (mmin_s[None] - o_l[:, None]) * inv_l[:, None]
                t1 = (mmax_s[None] - o_l[:, None]) * inv_l[:, None]
                lo = jnp.minimum(t0, t1).max(-1)
                hi = jnp.maximum(t0, t1).min(-1)
                h = ((hi > jnp.maximum(lo, T_MIN)) & (lo < tb[:, None])
                     & val[:, None])
                entry = jnp.where(h, lo, BIG).min(0)  # [F]
                order = jnp.argsort(entry).astype(jnp.int32)
                entry_s = jnp.sort(entry)
                count = (entry_s < jnp.float32(0.5) * BIG).sum(
                    dtype=jnp.int32)

                def cond(c3):
                    k, tb3, _ = c3
                    return (k < count) & (entry_s[k] < tb3.max())

                def body(c3):
                    k, tb3, bb3 = c3
                    start = base_s + order[k] * cw
                    pk = jax.lax.dynamic_slice_in_dim(sph, start, cw, 0)[
                        None]
                    center = pk[..., :3]
                    radius = pk[..., 3]
                    oc = o_b - center
                    half_b = (oc * d_b).sum(-1)
                    c2 = (oc * oc).sum(-1) - radius * radius
                    disc = half_b * half_b - a_l * c2
                    ex = disc >= 0.0
                    sq = jnp.sqrt(jnp.where(ex, jnp.maximum(disc, 1e-30),
                                            1.0))
                    t_near = (-half_b - sq) / a_l
                    t_far = (-half_b + sq) / a_l
                    t_max = tb3[:, None]
                    ok1 = ex & (t_near >= T_MIN) & (t_near <= t_max)
                    ok2 = ex & (t_far >= T_MIN) & (t_far <= t_max)
                    t = jnp.where(ok1, t_near,
                                  jnp.where(ok2, t_far, BIG))
                    j = jnp.argmin(t, axis=1).astype(jnp.int32)
                    tt = jnp.min(t, axis=1)
                    upd = tt < tb3
                    return (k + 1, jnp.where(upd, tt, tb3),
                            jnp.where(upd, start + j, bb3))

                k0 = count * 0
                _, tb, bb = jax.lax.while_loop(cond, body, (k0, tb, bb))
                # merge back (idx unique within a super's bin)
                sidx = jnp.where(val, idx, n)
                upd = tb < t_best[idxc]
                t_new = jnp.where(upd & val, tb, t_best[idxc])
                b_new = jnp.where(upd & val, bb, best[idxc])
                t_best = t_best.at[sidx].set(t_new, mode="drop",
                                             unique_indices=True)
                best = best.at[sidx].set(b_new, mode="drop",
                                         unique_indices=True)
                return (t_best, best), None

            (t_best, best), _ = jax.lax.scan(tile_body, (t_best, best),
                                             bids)
            return (t_best, best), None

        base = jnp.asarray(run.base + np.arange(S) * F * cw, jnp.int32)
        (t_best, best), _ = jax.lax.scan(
            super_body, (t_best0, best0), (binids, mmin, mmax, base))
        return t_best, best

    return trace


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    slack = float(sys.argv[2]) if len(sys.argv) > 2 else 1.1
    scene, half = make_big_scene(K)
    geom, layout = build_clusters(scene.arrays.geom, scene.static.n_prims)
    geom = jax.device_put(geom)
    print(f"# K={K}: runs={len(layout.runs)} tail={len(layout.tail)} "
          f"clusters={layout.runs[0].n_clusters} width="
          f"{layout.runs[0].width}", flush=True)

    tr = make_cluster_intersector(scene.static, layout)
    trace = jax.jit(lambda o, d, a: tr(
        geom, o, d, jnp.zeros(o.shape[0]), T_MIN,
        jnp.zeros(o.shape[0], jnp.uint32), a))

    rng = np.random.default_rng(1)
    o2 = jnp.asarray(rng.uniform(-half, half, (N, 3)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    key_fn = make_coherence_key(layout)
    order = jax.jit(lambda o, d: jnp.argsort(key_fn(o, d)))(o2, d2)
    o3 = o2[order]
    d3 = d2[order]
    act = jnp.ones(N, bool)

    t_base = bench(lambda o, d, a: trace(o, d, a)[0].sum(), o3, d3, act)
    tb_ref, bb_ref = jax.jit(trace)(o3, d3, act)
    print(f"baseline sorted secondary {t_base*1e3:9.1f} ms", flush=True)

    # host-side probe for the bin capacity
    smin = np.stack([layout.runs[0].cmin[s * SUPER_FANOUT:(s + 1)
                     * SUPER_FANOUT].min(0)
                     for s in range(-(-layout.runs[0].n_clusters
                                      // SUPER_FANOUT))])
    smax = np.stack([layout.runs[0].cmax[s * SUPER_FANOUT:(s + 1)
                     * SUPER_FANOUT].max(0)
                     for s in range(smin.shape[0])])
    on = np.asarray(o3, np.float64)
    dn = np.asarray(d3, np.float64)
    t0 = (smin[None] - on[:, None]) / dn[:, None]
    t1 = (smax[None] - on[:, None]) / dn[:, None]
    lo = np.minimum(t0, t1).max(-1)
    hi = np.maximum(t0, t1).min(-1)
    ovl = (hi > np.maximum(lo, T_MIN)) & (lo < BIG)
    counts = ovl.sum(0)
    print(f"# supers/lane mean {ovl.sum(1).mean():.2f}  max bin "
          f"{counts.max()}  total pairs {ovl.sum()}", flush=True)
    cap = int(-(-int(counts.max() * slack) // BIN_TILE) * BIN_TILE)

    btr = make_binned_trace(geom, layout, cap)
    binned = jax.jit(lambda o, d, a: btr(
        o, d, a, jnp.where(a, jnp.float32(BIG), jnp.float32(-BIG)),
        jnp.full(o.shape[0], -1, jnp.int32)))
    t_bin = bench(lambda o, d, a: binned(o, d, a)[0].sum(), o3, d3, act)
    print(f"binned   sorted secondary {t_bin*1e3:9.1f} ms  (cap {cap})",
          flush=True)

    tb_b, bb_b = jax.jit(binned)(o3, d3, act)
    same_t = np.allclose(np.asarray(tb_b), np.asarray(tb_ref), rtol=1e-5,
                         atol=1e-4)
    match = float((np.asarray(bb_b) == np.asarray(bb_ref)).mean())
    print(f"# parity: t allclose={same_t}  prim match={match:.4f} "
          "(ties/overflow may differ)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
