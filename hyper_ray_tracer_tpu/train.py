"""Differentiable rendering / inverse-rendering training step.

The reference has no training of any kind; differentiability is the north
star beyond the reference (BASELINE.json): the whole wavefront forward pass
is ``jax.grad``-able w.r.t. geometry (sphere centers/radii), materials
(albedo/fuzz/IOR), and texture parameters (colors, noise scale, image
texels).

Gradient conventions for discrete events (SURVEY.md §7 "hard parts"):
* hit/miss, BVH visit order, reflect-vs-refract Bernoulli, checker sign and
  texel choice are *fixed decisions* of the primal — gradients flow through
  the continuous quantities (hit t, scatter direction, Schlick weight is a
  sampled branch, attenuation colors) and not through the decision
  boundaries.  Finite-difference checks therefore hold at configurations
  where an epsilon does not flip a decision (tests/test_grad.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.scene import Scene
from .render import deprecate_use_bvh, make_ray_colorer

# SceneArrays leaves that are trainable.  Everything else (type tags, ids,
# AABBs, BVH, perlin permutation tables) stays fixed.
PARAM_PATHS = (
    ("geom", "p0"),
    ("geom", "p1"),
    ("geom", "radius"),
    ("materials", "albedo"),
    ("materials", "fuzz"),
    ("materials", "ior"),
    ("textures", "color1"),
    ("textures", "color2"),
    ("textures", "scale"),
    ("images", None),
)


def extract_params(arrays):
    params = {}
    for group, field in PARAM_PATHS:
        node = getattr(arrays, group)
        params[f"{group}.{field}"] = (
            node if field is None else getattr(node, field)
        )
    return params


def merge_params(arrays, params):
    for group, field in PARAM_PATHS:
        key = f"{group}.{field}"
        if field is None:
            arrays = arrays._replace(**{group: params[key]})
        else:
            node = getattr(arrays, group)._replace(**{field: params[key]})
            arrays = arrays._replace(**{group: node})
    return arrays


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple


def measure_compact_schedule(scene, W, H, depth, intersector, arrays, bvh,
                             basis, pixel_ids, sample_ids, seed=0,
                             leaf_size: int = 4, margin: float = 0.15):
    """One counted (uncompacted) pass -> per-bounce bucket schedule tuple
    for these launch shapes, for ``make_loss_fn(compact_sched=...)``.

    Training can reuse the inference scheduler because compaction is a
    pure permutation that drops only dead lanes: the compacted forward is
    bit-identical, so its gradients equal the fixed-scan gradients.

    ``margin`` inflates the measured survival counts before bucketing:
    unlike inference, a training loop *changes* the scene parameters the
    survival curve depends on, and the jitted loss cannot re-probe —
    15% default headroom absorbs optimization drift.  If survival still
    outgrows a bucket, the loss carries a loud penalty term (see
    make_loss_fn) rather than failing silently; re-measure the schedule
    when that fires."""
    from .render import make_ray_colorer as _mrc
    from .render import schedule_from_counts

    colorer = _mrc(scene, W, H, depth, intersector, leaf_size,
                   differentiable=False)
    st = jax.jit(colorer.init_state)(
        basis, pixel_ids.reshape(-1), sample_ids.reshape(-1),
        jnp.uint32(seed))
    _, counts = jax.jit(colorer.bounce_scan_counted, static_argnums=(4,))(
        arrays, bvh, st, jnp.uint32(0), depth)
    counts = np.ceil(np.asarray(counts)[:-1] * (1.0 + margin))
    return tuple(schedule_from_counts(counts,
                                      int(np.prod(pixel_ids.shape))))


def measure_partition_schedule(scene, W, H, depth, intersector, arrays, bvh,
                               basis, pixel_ids, sample_ids, seed=0,
                               leaf_size: int = 4, margin: float = 0.15):
    """Counted per-category probe -> (pre, entries) partitioned schedule
    for ``make_loss_fn(partition_sched=...)`` — the training analogue of
    the inference partitioned descent (render.py §partition).

    Returns None when the scene has no partition groups or a group lacks
    a device-computable AABB (``PartGroup.dynamic_ok``); fall back to
    ``measure_compact_schedule`` then.  ``margin`` widens BOTH the
    category buckets (more survivors) and the drop regions (fewer
    survivors): training drifts the survival curve in either direction.
    """
    from .render import make_ray_colorer as _mrc
    from .render import schedule_from_cat_counts

    colorer = _mrc(scene, W, H, depth, intersector, leaf_size,
                   differentiable=False)
    pg = colorer.part_groups
    if not pg or not all(g.dynamic_ok for g in pg):
        return None
    st = jax.jit(colorer.init_state)(
        basis, pixel_ids.reshape(-1), sample_ids.reshape(-1),
        jnp.uint32(seed))
    pre_c = jax.jit(lambda s, g: colorer.cat_counts(s, geom=g))(
        st, arrays.geom)
    _, counts = jax.jit(colorer.bounce_scan_counted_cats,
                        static_argnums=(4,))(
        arrays, bvh, st, jnp.uint32(0), depth)
    pre, entries = schedule_from_cat_counts(
        np.asarray(pre_c), np.asarray(counts)[:-1],
        int(np.prod(pixel_ids.shape)), pg, scene.static.n_prims,
        margin=margin)
    return pre, tuple(entries)


@deprecate_use_bvh
def make_loss_fn(scene: Scene, W: int, H: int, depth: int,
                 intersector: bool, leaf_size: int = 4, remat: bool = False,
                 silhouette: bool = False, compact_sched=None,
                 partition_sched=None):
    """loss(params, arrays, bvh, basis, pixel_ids, sample_ids, seed, target)
    = mean squared error between mean radiance and a target image
    ([W*H, 3], linear radiance, bottom-up rows).

    ``silhouette=True`` adds the edge-sampled boundary term (ops/edges.py)
    so geometry gradients also see occlusion-boundary motion, not just the
    fixed-decision interior term.  Requires ``pixel_ids`` to cover the full
    frame (the correction is a whole-image tangent).

    ``compact_sched`` (a ``measure_compact_schedule`` tuple) runs the
    forward as the scheduled compacted descent instead of the fixed-depth
    scan — the same dead-ray scheduler inference uses, inside one traced
    function so ``jax.grad`` differentiates straight through the
    compaction gathers (their VJPs are scatter-adds).  Radiance is
    bit-identical to the fixed scan, so gradients match; the forward
    drops the ~3x dead-lane work at depth >= 10.

    ``partition_sched`` (from ``measure_partition_schedule``; overrides
    ``compact_sched``) runs the forward as the PARTITIONED compacted
    descent: group AABBs are recomputed on device from the current
    geometry every milestone (compact_wavefront_part's ``geom`` arg), so
    the cull stays conservative as the optimizer moves centers/radii.
    Caveat inherited from the partitioned sweep: the forward (hence the
    gradient estimate) matches the fixed scan statistically, not bitwise
    — near-tie winner flips at ulp scale, far below MC gradient noise.

    Schedule-overflow safety: training moves the very parameters the
    survival curve depends on, so a bucket can eventually overflow —
    live lanes would stop bouncing early and silently bias gradients.
    The loss therefore adds ``1e6 * (any bucket overflowed)``: a
    gradient-free tripwire (the flag comes from integer compares under
    stop_gradient semantics) that makes a stale schedule unmissable in
    the loss curve.  Re-run the schedule probe when it fires."""
    ray_color = make_ray_colorer(scene, W, H, depth, intersector, leaf_size,
                                 remat=remat)
    if silhouette:
        from .ops.edges import make_silhouette_correction

        correction = make_silhouette_correction(scene, W, H, depth, intersector,
                                                leaf_size)
    if partition_sched is not None:
        from .ops import partition as _partition
        from .render import (
            assemble_radiance,
            compact_wavefront_part,
            schedule_segments,
        )

        pg = ray_color.part_groups
        assert pg and all(g.dynamic_ok for g in pg), \
            "partition_sched requires dynamic-AABB partition groups"
        pre, entries = partition_sched

        def render(arrays, bvh, basis, pixel_ids, sample_ids, seed):
            n0 = pixel_ids.shape[0]
            state = ray_color.init_state(basis, pixel_ids, sample_ids,
                                         seed)
            slots = jnp.arange(n0, dtype=jnp.int32)
            over = None
            rows = None
            drops = []
            hole_base = n0

            def compact(state, slots, buckets, dropb, hb):
                gs = pg if len(buckets) > 1 else ()
                return compact_wavefront_part(
                    state, slots, buckets, dropb, gs,
                    geom=arrays.geom if gs else None, hole_base=hb)

            if pre is not None:
                state, slots, drop, over = compact(state, slots,
                                                   pre[0], pre[1],
                                                   hole_base)
                drops.append(drop)
                hole_base += sum(pre[0]) + pre[1]
                rows = _partition.group_rows(pg, pre[0])
            for b0, nb, entry in schedule_segments(entries, depth):
                if rows is not None:
                    state = ray_color.bounce_scan_rows(
                        arrays, bvh, state, jnp.uint32(b0), nb, rows)
                else:
                    state = ray_color.bounce_scan(
                        arrays, bvh, state, jnp.uint32(b0), nb)
                if entry is not None:
                    buckets, dropb = entry
                    state, slots, drop, o = compact(state, slots,
                                                    buckets, dropb,
                                                    hole_base)
                    drops.append(drop)
                    hole_base += sum(buckets) + dropb
                    over = o if over is None else (over | o)
                    rows = (_partition.group_rows(pg, buckets)
                            if len(buckets) > 1 else None)
            return assemble_radiance(n0, drops, state, slots), over

    elif compact_sched is not None:
        from .render import (
            assemble_radiance,
            compact_wavefront,
            schedule_groups,
        )

        groups = schedule_groups(list(compact_sched), depth)

        def render(arrays, bvh, basis, pixel_ids, sample_ids, seed):
            n0 = pixel_ids.shape[0]
            state = ray_color.init_state(basis, pixel_ids, sample_ids,
                                         seed)
            slots = jnp.arange(n0, dtype=jnp.int32)
            over = None
            drops = []
            for b0, b1, bucket in groups:
                state = ray_color.bounce_scan(arrays, bvh, state,
                                              jnp.uint32(b0), b1 - b0)
                if bucket is not None:
                    state, slots, drop, o = compact_wavefront(
                        state, slots, bucket)
                    drops.append(drop)
                    over = o if over is None else (over | o)
            return assemble_radiance(n0, drops, state, slots), over

    else:
        def render(arrays, bvh, basis, pixel_ids, sample_ids, seed):
            rad = ray_color(arrays, bvh, basis, pixel_ids, sample_ids,
                            seed)
            return rad, None

    def loss_fn(params, arrays, bvh, basis, pixel_ids, sample_ids, seed,
                target):
        arrays = merge_params(arrays, params)
        s_blk = pixel_ids.shape[0]
        rad, over = render(arrays, bvh, basis, pixel_ids.reshape(-1),
                           sample_ids.reshape(-1), seed)
        mean_rad = rad.reshape(s_blk, W * H, 3).mean(0)
        if silhouette:
            mean_rad = mean_rad + correction(arrays, bvh, basis, seed)
        loss = jnp.mean((mean_rad - target) ** 2)
        if over is not None:
            # Stale-schedule tripwire (docstring): loud, gradient-free.
            loss = loss + 1e6 * over.astype(jnp.float32)
        return loss

    return loss_fn


@deprecate_use_bvh
def make_train_step(scene: Scene, W: int, H: int, depth: int,
                    intersector: bool, leaf_size: int = 4,
                    learning_rate: float = 1e-2, remat: bool = False,
                    silhouette: bool = False, compact_sched=None,
                    partition_sched=None):
    """One adam step of inverse rendering.  Fully jittable; under a sharded
    jit the scene-parameter gradients are psum-reduced across the mesh by
    autodiff (replicated params, sharded rays)."""
    loss_fn = make_loss_fn(scene, W, H, depth, intersector, leaf_size,
                           remat=remat, silhouette=silhouette,
                           compact_sched=compact_sched,
                           partition_sched=partition_sched)
    optimizer = optax.adam(learning_rate)

    def init(arrays) -> TrainState:
        params = extract_params(arrays)
        return TrainState(params=params, opt_state=optimizer.init(params))

    def step(state: TrainState, arrays, bvh, basis, pixel_ids, sample_ids,
             seed, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, arrays, bvh, basis, pixel_ids, sample_ids, seed,
            target,
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state), loss

    return init, step
