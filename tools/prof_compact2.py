"""Ablate the REAL partitioned compaction at the bench shape (real TPU).

prof_compact's synthetic micro-bench was misleading: gather/scatter cost
on this machine is dominated by index LOCALITY (a fully random 1M-row
permutation gathers at ~1.9 us/row; the real compaction permutation is
order-preserving within categories and runs the whole thing in ~121 ms).
So this tool cuts the real ``compact_wavefront_part`` at successive
points, on the real segment-0 wavefront of the flagship descent:

  cat       lane_layout_cat (AABB overlap masks)
  dest      + category cumsums -> dest positions
  idx       + permutation inversion scatter
  gather    + 13-col fpk row gather + ipk
  full      + drop-region flush + hole bookkeeping

Run from the repo root: ``python -m tools.prof_compact2``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops import partition as P
from hyper_ray_tracer_tpu.render import (
    block_order,
    compact_wavefront_part,
    make_ray_colorer,
    prepare_scene,
    schedule_from_cat_counts,
)

W, H, SPP, DEPTH = 400, 225, 16, 10
N = W * H * SPP


def timeit(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def cut_compact(state, slots, acc, buckets, drop_bucket, groups, point):
    """compact_wavefront_part truncated at ``point`` (same code shape)."""
    n = state.alive.shape[0]
    n0 = acc.shape[0]
    C = len(buckets)
    offs = np.concatenate([[0], np.cumsum(buckets)]).astype(np.int64)
    b_total = int(offs[-1])
    alive = state.alive
    iota = jnp.arange(n, dtype=jnp.int32)

    catl = P.lane_layout_cat(groups, state.o, state.d, jnp)
    if point == "cat":
        return catl.sum()
    dest = jnp.full(n, b_total + drop_bucket, jnp.int32)
    kept = jnp.zeros(n, bool)
    kept_cum = None
    for p in range(C):
        is_p = alive & (catl == p)
        cum = jnp.cumsum(is_p)
        rank = cum - 1
        ok = is_p & (rank < buckets[p])
        dest = jnp.where(ok, np.int32(offs[p]) + rank, dest)
        kept = kept | ok
        kc = jnp.minimum(cum, buckets[p])
        kept_cum = kc if kept_cum is None else kept_cum + kc
    is_drop = ~kept
    iota_n = jnp.arange(n, dtype=kept_cum.dtype)
    rank_d = iota_n - kept_cum
    ok_d = is_drop & (rank_d < drop_bucket)
    dest = jnp.where(ok_d, np.int32(b_total) + rank_d.astype(jnp.int32),
                     dest)
    if point == "dest":
        return dest.sum()
    idx_full = (
        jnp.zeros(b_total + drop_bucket, jnp.int32)
        .at[dest]
        .set(iota, mode="drop", unique_indices=True)
    )
    if point == "idx":
        return idx_full.sum()
    idx = idx_full[:b_total]
    idx_drop = idx_full[b_total:]
    fpk = jnp.concatenate(
        [state.o, state.d, state.time[:, None], state.throughput,
         state.radiance], axis=-1)[idx]
    ipk = jnp.stack(
        [jax.lax.bitcast_convert_type(state.base, jnp.int32), slots],
        axis=-1)[idx]
    if point == "gather":
        return fpk.sum() + ipk.sum()
    if point == "full_set":
        # Every slot is flushed at most once per pass and acc starts the
        # pass at zero, so scatter-SET is value-identical to scatter-add
        # here — the candidate rewrite this tool exists to cost.
        acc2 = acc.at[slots[idx_drop]].set(state.radiance[idx_drop],
                                           mode="drop",
                                           unique_indices=True)
    elif point == "drop_rows":
        # No full-size accumulator at all: emit the dropped (radiance,
        # slot) rows compactly; a single end-of-pass scatter would place
        # them.  Costs only the two drop-region gathers.
        acc2 = (state.radiance[idx_drop].sum()
                + slots[idx_drop].sum(dtype=jnp.float32))
        return fpk.sum() + ipk.sum() + acc2
    elif point == "flush_fresh":
        # Scatter into a fresh in-jit zeros target: isolates the cost of
        # copying the pass-carried acc input (which jit cannot mutate).
        acc2 = jnp.zeros_like(acc).at[slots[idx_drop]].add(
            state.radiance[idx_drop], mode="drop", unique_indices=True)
    elif point == "flush_img":
        # Scatter-add straight into per-PIXEL sums (slot % n_pix): 16x
        # smaller target, collisions across samples allowed.
        n_pix = acc.shape[0] // 16
        img = jnp.zeros((n_pix, 3), acc.dtype).at[
            slots[idx_drop] % n_pix].add(
            state.radiance[idx_drop], mode="drop")
        return fpk.sum() + ipk.sum() + img.sum()
    elif point == "flush_planes":
        # 3 single-column scatter-sets into fresh [N] planes: the minor
        # dim of a [k,3] scatter row defeats the 128-lane VPU; plane
        # scatters write one contiguous element per row descriptor.
        rad = state.radiance[idx_drop]
        sl = slots[idx_drop]
        planes = [jnp.zeros(acc.shape[0], acc.dtype).at[sl].set(
            rad[:, c], mode="drop", unique_indices=True) for c in range(3)]
        return fpk.sum() + ipk.sum() + sum(p.sum() for p in planes)
    elif point == "flush_set_fresh":
        acc2 = jnp.zeros_like(acc).at[slots[idx_drop]].set(
            state.radiance[idx_drop], mode="drop", unique_indices=True)
    elif point == "flush_i32":
        # Same indices, single int32 column: row-width sensitivity.
        acc2 = jnp.zeros(acc.shape[0], jnp.int32).at[
            slots[idx_drop]].set(idx_drop, mode="drop",
                                 unique_indices=True)
    else:
        acc2 = acc.at[slots[idx_drop]].add(state.radiance[idx_drop],
                                           mode="drop",
                                           unique_indices=True)
    return fpk.sum() + ipk.sum() + acc2.sum()


def main():
    scene = build_scene("final")
    print("device:", jax.devices()[0], flush=True)
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    colorer = make_ray_colorer(scene, W, H, DEPTH, mode,
                               differentiable=False)
    pg = colorer.part_groups

    id_init = jax.jit(
        lambda basis, perm, seed: colorer.init_state(
            basis,
            jnp.tile(perm, SPP),
            jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), perm.shape[0]),
            seed,
        ))
    perm = jnp.asarray(block_order(W, H))
    arrays, bvh, basis, perm = jax.device_put((arrays, bvh, basis, perm))
    t0 = time.perf_counter()
    np.asarray(jnp.float32(1.0) + perm[0] * 0)
    print(f"warmup transfer: {time.perf_counter()-t0:.1f} s", flush=True)

    st0 = id_init(basis, perm, jnp.uint32(0))

    def counted(arrays, bvh, state):
        pre = colorer.cat_counts(state)
        st, counts = colorer.bounce_scan_counted_cats(
            arrays, bvh, state, jnp.uint32(0), DEPTH)
        return st, pre, counts

    _, pre_c, cat_c = jax.jit(counted)(arrays, bvh, st0)
    pre, entries = schedule_from_cat_counts(
        np.asarray(pre_c), np.asarray(cat_c)[:-1], N, pg,
        scene.static.n_prims)
    print("pre:", pre, "entry0:", entries[0], flush=True)

    # Segment-0 input: init + pre-partition + bounce 0.
    compact_jit = jax.jit(
        lambda st, sl, b, db: compact_wavefront_part(
            st, sl, b, db, pg, hole_base=N), static_argnums=(2, 3))
    scanrows_jit = jax.jit(colorer.bounce_scan_rows,
                           static_argnums=(4, 5))
    acc = jnp.zeros((N, 3), jnp.float32)
    slots = jnp.arange(N, dtype=jnp.int32)
    state, slots, _, _ = compact_jit(st0, slots, pre[0], pre[1])
    rows = P.group_rows(pg, pre[0])
    state = scanrows_jit(arrays, bvh, state, jnp.uint32(0), 1, rows)
    (state, slots, acc) = jax.block_until_ready((state, slots, acc))
    buckets, dropb = entries[0]
    print(f"lanes {state.o.shape[0]} -> {sum(buckets)}+{dropb}",
          flush=True)

    one = jnp.float32(1.0)
    t_sync = timeit(lambda: np.asarray(one * 1.0), reps=5)
    print(f"sync floor: {t_sync*1e3:6.1f} ms", flush=True)

    prev = t_sync
    for point in ("cat", "dest", "idx", "gather", "drop_rows", "full",
                  "full_set", "flush_fresh", "flush_img", "flush_i32",
                  "flush_planes", "flush_set_fresh"):
        g = jax.jit(lambda st, sl, a: cut_compact(
            st, sl, a, buckets, dropb, pg, point))
        t = timeit(lambda: np.asarray(g(state, slots, acc)))
        print(f"  {point:10s} {t*1e3:8.1f} ms  "
              f"(delta {(t-prev)*1e3:+7.1f})", flush=True)
        prev = t

    # Donation: without it every milestone copies the full [N,3] acc.
    for point in ("full", "full_set"):
        g = jax.jit(lambda st, sl, a: cut_compact(
            st, sl, a, buckets, dropb, pg, point), donate_argnums=(2,))
        t = timeit(lambda: np.asarray(g(state, slots,
                                        jnp.zeros((N, 3), jnp.float32))))
        print(f"  {point:10s} donated {t*1e3:8.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
