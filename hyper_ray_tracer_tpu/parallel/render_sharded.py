"""Sharded rendering and distributed gradients.

Two complementary strategies (SURVEY.md §2.6 "TPU-native mapping"):

* ``make_pjit_renderer`` — GSPMD auto-partitioning: ray ids are sharded over
  the ``rays`` mesh axis, scene arrays are replicated, and XLA partitions the
  whole wavefront (every per-ray op is elementwise over the sharded axis;
  gathers read replicated tables, so no resharding is ever needed).  This is
  the zero-communication fast path — the only collective in the backward
  pass is the psum of scene-parameter gradients that autodiff inserts.

* ``make_shardmap_renderer`` — explicit `shard_map` with the sample (spp)
  axis sharded too: devices on the ``spp`` axis render disjoint sample
  subsets of the same pixels and ``psum`` their radiance sums over ICI
  (the domain's sequence-parallel analogue).

Both produce per-pixel radiance *sums* over the sample block, bit-identical
to the single-device renderer (counter-based RNG keys depend only on
(pixel, sample), never on device placement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..render import (
    assemble_radiance,
    compact_wavefront,
    deprecate_use_bvh,
    compact_wavefront_part,
    compact_wavefront_sorted,
    make_ray_colorer,
    schedule_from_cat_counts,
    schedule_from_counts,
    schedule_groups,
    schedule_segments,
)
from .mesh import AXIS_RAYS, AXIS_SPP


def _ids_for_block(W, H, sample0, n_samples):
    """pixel_ids [S, W*H], sample_ids [S, W*H] for a sample block."""
    pix = jnp.arange(W * H, dtype=jnp.int32)
    pixel_ids = jnp.broadcast_to(pix, (n_samples, W * H))
    sample_ids = jnp.broadcast_to(
        (sample0 + jnp.arange(n_samples, dtype=jnp.int32))[:, None],
        (n_samples, W * H),
    )
    return pixel_ids, sample_ids


@deprecate_use_bvh
def make_pjit_renderer(scene, W, H, depth, mesh, intersector, leaf_size=4,
                       differentiable=False):
    """GSPMD path: returns render(arrays, bvh, basis, sample0, seed) ->
    [W*H, 3] radiance sum over ``n_samples`` samples.

    ``n_samples`` is fixed at build time (static shape); ray ids are laid
    out [S, W*H] and sharded (spp, rays).
    """
    ray_color = make_ray_colorer(scene, W, H, depth, intersector, leaf_size,
                                 differentiable=differentiable)
    id_sharding = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    out_sharding = NamedSharding(mesh, P(AXIS_RAYS))

    def render(arrays, bvh, basis, pixel_ids, sample_ids, seed):
        s_blk, n_pix = pixel_ids.shape
        rad = ray_color(arrays, bvh, basis, pixel_ids.reshape(-1),
                        sample_ids.reshape(-1), seed)
        return rad.reshape(s_blk, n_pix, 3).sum(0)

    render_jit = jax.jit(render, out_shardings=out_sharding)

    def run(arrays, bvh, basis, sample0, n_samples, seed):
        pixel_ids, sample_ids = _ids_for_block(W, H, sample0, n_samples)
        pixel_ids = jax.device_put(pixel_ids, id_sharding)
        sample_ids = jax.device_put(sample_ids, id_sharding)
        return render_jit(arrays, bvh, basis, pixel_ids, sample_ids,
                          np.uint32(seed))

    return run


@deprecate_use_bvh
def make_shardmap_renderer(scene, W, H, depth, mesh, intersector, leaf_size=4,
                           differentiable=False):
    """Explicit shard_map path with spp-axis psum.

    Returns render(arrays, bvh, basis, pixel_ids, sample_ids, seed) ->
    [W*H, 3] radiance sum; pixel/sample ids are [S, W*H] and must be
    divisible by the mesh axes.
    """
    ray_color = make_ray_colorer(scene, W, H, depth, intersector, leaf_size,
                                 differentiable=differentiable)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS_SPP, AXIS_RAYS),
                  P(AXIS_SPP, AXIS_RAYS), P()),
        out_specs=P(AXIS_RAYS),
    )
    def render_block(arrays, bvh, basis, pixel_ids, sample_ids, seed):
        s_loc, n_loc = pixel_ids.shape
        rad = ray_color(arrays, bvh, basis, pixel_ids.reshape(-1),
                        sample_ids.reshape(-1), seed)
        rad = rad.reshape(s_loc, n_loc, 3).sum(0)
        # Sample-parallel partial sums -> one psum over ICI.
        return jax.lax.psum(rad, AXIS_SPP)

    return jax.jit(render_block)


@deprecate_use_bvh
def make_sharded_compacting_renderer(scene, W, H, depth, mesh, intersector,
                                     leaf_size=4, partition_sweep=True):
    """Dead-ray compaction inside ``shard_map``: the multi-chip version of
    ``render.make_compacting_renderer``.

    The single-chip compacting path is host-driven (it reads alive counts
    to choose bucket shapes), which SPMD cannot do — shapes must be static
    and identical on every device.  The fixed bucket schedule solves this:

    1. The first call runs a PROBE pass — the plain fixed-depth sharded
       wavefront (a valid, uncompacted render) that also emits the
       per-bounce alive counts ``pmax``-ed over the mesh.  One readback.
    2. The host turns the worst-device counts into a static local bucket
       schedule (same ~4% head-room policy as the single-chip path).
    3. Subsequent calls run the whole compacted chain in ONE jitted
       shard_map program: per-device scan segments, per-device
       cumsum-pack compaction to the scheduled buckets, drop-only
       radiance flushes, and a psum of the per-pixel sums over the spp
       axis.  A pmax-ed overflow flag is returned with the image; on
       overflow (survival shifted past the head-room) the caller's next
       pass re-probes — overflow is detected, never silent, so
       scheduling cannot change the image.

    Results are bit-identical to the uncompacted sharded renderer (every
    ray's RNG stream is keyed by (pixel, sample); compaction only drops
    dead lanes; each lane's radiance lands in its own slot before the
    fixed-order sample reduction) — EXCEPT on scenes with partition
    groups, where the scheduled pass additionally runs the partitioned
    sweep (render.py compact_wavefront_part; per-device local wavefronts
    above ops.partition.PART_MIN_LANES) and matches statistically rather
    than bitwise, same contract as the single-chip partitioned path.

    Matches the load-balancing role of the reference's tile scheduler
    (`/root/reference/src/application.rs:393-475`), executed as static
    SPMD instead of a work queue.
    """
    colorer = make_ray_colorer(scene, W, H, depth, intersector, leaf_size,
                               differentiable=False)
    part_groups = colorer.part_groups
    use_part = len(part_groups) > 0 and partition_sweep
    # Cluster mode: the coherence-sorted compaction is a purely LOCAL
    # permutation of each device's lanes (no collectives), so it drops
    # into the SPMD chain unchanged — same bit-identity contract as the
    # single-chip path (render.compact_wavefront_sorted).
    _key_fn = None
    _layout = colorer.cluster_layout
    if _layout is not None and _layout.runs:
        from ..ops.cluster_sweep import make_coherence_key

        _key_fn = make_coherence_key(_layout)

    def _compact_plain(state, slots, bucket):
        if _key_fn is not None:
            return compact_wavefront_sorted(
                state, slots, bucket, _key_fn(state.o, state.d))
        return compact_wavefront(state, slots, bucket)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS_SPP, AXIS_RAYS),
                  P(AXIS_SPP, AXIS_RAYS), P()),
        out_specs=((P(AXIS_RAYS), P(), P(), P())
                   if use_part else (P(AXIS_RAYS), P())),
    )
    def probe_block(arrays, bvh, basis, pixel_ids, sample_ids, seed):
        s_loc, n_loc = pixel_ids.shape
        state = colorer.init_state(basis, pixel_ids.reshape(-1),
                                   sample_ids.reshape(-1), seed)
        if use_part:
            # Partitioned probe: the worst-device per-CATEGORY counts
            # become one shared schedule, so every device compiles the
            # same static buckets/rows (SPMD requires identical shapes).
            # Drop regions, by contrast, are largest on the device with
            # the FEWEST survivors — also emit the pmin'd totals.
            pre = colorer.cat_counts(state, geom=arrays.geom)
            state, counts = colorer.bounce_scan_counted_cats(
                arrays, bvh, state, jnp.uint32(0), depth)
            rad = state.radiance.reshape(s_loc, n_loc, 3).sum(0)
            rad = jax.lax.psum(rad, AXIS_SPP)
            pre = jax.lax.pmax(pre, (AXIS_SPP, AXIS_RAYS))
            cmax = jax.lax.pmax(counts[:-1], (AXIS_SPP, AXIS_RAYS))
            tmin = jax.lax.pmin(counts[:-1].sum(-1),
                                (AXIS_SPP, AXIS_RAYS))
            return rad, pre, cmax, tmin
        # One rolled scan over all bounces, emitting the per-bounce alive
        # counts (the full survival curve in one readback).
        state, counts = colorer.bounce_scan_counted(
            arrays, bvh, state, jnp.uint32(0), depth)
        rad = state.radiance.reshape(s_loc, n_loc, 3).sum(0)
        rad = jax.lax.psum(rad, AXIS_SPP)
        cmax = jax.lax.pmax(counts[:-1], (AXIS_SPP, AXIS_RAYS))
        return rad, cmax

    probe_jit = jax.jit(probe_block)

    def _make_scheduled(sched):
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(AXIS_SPP, AXIS_RAYS),
                      P(AXIS_SPP, AXIS_RAYS), P()),
            out_specs=(P(AXIS_RAYS), P()),
        )
        def sched_block(arrays, bvh, basis, pixel_ids, sample_ids, seed):
            s_loc, n_loc = pixel_ids.shape
            n0_loc = s_loc * n_loc
            state = colorer.init_state(basis, pixel_ids.reshape(-1),
                                       sample_ids.reshape(-1), seed)
            slots = jnp.arange(n0_loc, dtype=jnp.int32)
            over = state.alive[0] & ~state.alive[0]  # device-varying False
            drops = []
            # schedule_groups merges no-shrink bounce runs into single
            # rolled scans, so the block's graph holds O(#shrinks) bounce
            # bodies, not O(depth).
            for b0, b1, bucket in schedule_groups(sched, depth):
                state = colorer.bounce_scan(arrays, bvh, state,
                                            jnp.uint32(b0), b1 - b0)
                if bucket is not None:
                    state, slots, drop, o = _compact_plain(
                        state, slots, bucket)
                    drops.append(drop)
                    over = over | o
            acc = assemble_radiance(n0_loc, drops, state, slots)
            rad = acc.reshape(s_loc, n_loc, 3).sum(0)
            rad = jax.lax.psum(rad, AXIS_SPP)
            over = jax.lax.pmax(over.astype(jnp.int32),
                                (AXIS_SPP, AXIS_RAYS))
            return rad, over

        return jax.jit(sched_block)

    def _make_scheduled_part(psched):
        """Partitioned descent per device (render.py _run_scheduled_part,
        shard_map edition): the shared worst-device schedule keeps every
        device's buckets/rows static and identical, so the whole chain is
        one SPMD program with a psum at the end."""
        from ..ops import partition as _partition

        pre, entries = psched

        all_dyn = all(g.dynamic_ok for g in part_groups)

        def _compact(state, slots, geom, buckets, dropb, hb):
            gs = part_groups if len(buckets) > 1 else ()
            return compact_wavefront_part(
                state, slots, buckets, dropb, gs,
                geom=geom if (gs and all_dyn) else None, hole_base=hb)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(AXIS_SPP, AXIS_RAYS),
                      P(AXIS_SPP, AXIS_RAYS), P()),
            out_specs=(P(AXIS_RAYS), P()),
        )
        def sched_block(arrays, bvh, basis, pixel_ids, sample_ids, seed):
            s_loc, n_loc = pixel_ids.shape
            n0_loc = s_loc * n_loc
            state = colorer.init_state(basis, pixel_ids.reshape(-1),
                                       sample_ids.reshape(-1), seed)
            slots = jnp.arange(n0_loc, dtype=jnp.int32)
            over = state.alive[0] & ~state.alive[0]  # device-varying False
            rows = None
            drops = []
            hole_base = n0_loc
            if pre is not None:
                state, slots, drop, o = _compact(state, slots,
                                                 arrays.geom, pre[0],
                                                 pre[1], hole_base)
                drops.append(drop)
                hole_base += sum(pre[0]) + pre[1]
                over = over | o
                rows = _partition.group_rows(part_groups, pre[0])
            for b0, nb, entry in schedule_segments(entries, depth):
                if rows is not None:
                    state = colorer.bounce_scan_rows(
                        arrays, bvh, state, jnp.uint32(b0), nb, rows)
                else:
                    state = colorer.bounce_scan(
                        arrays, bvh, state, jnp.uint32(b0), nb)
                if entry is not None:
                    buckets, dropb = entry
                    state, slots, drop, o = _compact(state, slots,
                                                     arrays.geom, buckets,
                                                     dropb, hole_base)
                    drops.append(drop)
                    hole_base += sum(buckets) + dropb
                    over = over | o
                    rows = (_partition.group_rows(part_groups, buckets)
                            if len(buckets) > 1 else None)
            acc = assemble_radiance(n0_loc, drops, state, slots)
            rad = acc.reshape(s_loc, n_loc, 3).sum(0)
            rad = jax.lax.psum(rad, AXIS_SPP)
            over = jax.lax.pmax(over.astype(jnp.int32),
                                (AXIS_SPP, AXIS_RAYS))
            return rad, over

        return jax.jit(sched_block)

    n_dev = int(np.prod([mesh.shape[a] for a in (AXIS_RAYS, AXIS_SPP)]))
    cache = {}  # ids shape -> (sched tuple, compiled scheduled block)

    def _to_host(rad):
        """rays-sharded global array -> full np array on every host
        (multi-host: assemble over DCN/ICI; single-process: plain copy)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(rad, tiled=True))
        return np.asarray(rad)

    def run(arrays, bvh, basis, pixel_ids, sample_ids, seed):
        """ids: [S, n_pix] global sample-major launch (divisible by the
        mesh axes).  Returns np [n_pix, 3] radiance summed over S."""
        key = tuple(pixel_ids.shape)
        n0_loc = (pixel_ids.shape[0] * pixel_ids.shape[1]) // n_dev
        entry = cache.get(key)
        if entry is not None:
            sched, block = entry
            rad, over = block(arrays, bvh, basis, pixel_ids, sample_ids,
                              seed)
            rad = _to_host(rad)
            if not int(np.asarray(over)):
                return rad
            cache.pop(key, None)  # stale schedule: re-probe below

        if use_part:
            rad, pre, cmax, tmin = probe_jit(arrays, bvh, basis,
                                             pixel_ids, sample_ids, seed)
            psched = schedule_from_cat_counts(
                np.asarray(pre), np.asarray(cmax), n0_loc, part_groups,
                scene.static.n_prims, tot_min=np.asarray(tmin))
            psched = (psched[0], tuple(psched[1]))
            cache[key] = (psched, _make_scheduled_part(psched))
        else:
            rad, cmax = probe_jit(arrays, bvh, basis, pixel_ids,
                                  sample_ids, seed)
            sched = schedule_from_counts(np.asarray(cmax), n0_loc)
            cache[key] = (tuple(sched), _make_scheduled(tuple(sched)))
        return _to_host(rad)

    run.cache = cache  # exposed for tests / inspection
    return run


def gather_image(radiance_sum, samples: int, W: int, H: int) -> np.ndarray:
    """Device-sharded radiance sum -> host image (gamma, top-down rows).

    Under multi-host each process addresses only its local shards, so the
    full accumulator is assembled with
    `multihost_utils.process_allgather` (an all-gather over DCN/ICI that
    leaves every host with the complete [W*H, 3] sum — the cross-process
    equivalent of the reference's mpsc tile funnel,
    `/root/reference/src/application.rs:213,284-306`).  Single-process
    runs skip the collective entirely.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        acc = np.asarray(
            multihost_utils.process_allgather(radiance_sum, tiled=True)
        ).astype(np.float64)
    else:
        acc = np.asarray(jax.device_get(radiance_sum)).astype(np.float64)
    return finish_image(acc, samples, W, H)


def finish_image(acc: np.ndarray, samples: int, W: int, H: int
                 ) -> np.ndarray:
    """Assembly math shared by the single- and multi-host paths: average,
    sqrt-gamma (application.rs:451-453), bottom-up rows -> top-down."""
    img = np.sqrt(np.maximum(acc / samples, 0.0)).astype(np.float32)
    return img.reshape(H, W, 3)[::-1]
