"""Device-side intersection: stackless BVH traversal + brute-force scan.

The reference traverses a boxed recursive BVH per ray on the CPU
(`/root/reference/src/hittable/bvh_node.rs:104-127`), clamping ``t_max`` to
the closest hit found so far.  On TPU both strategies below are bulk-
synchronous over the whole ray wavefront:

* ``traverse_bvh``: every ray carries a node cursor into the skip-threaded
  DFS array (see models/bvh_build.py).  One ``lax.while_loop`` step =
  one AABB slab test per ray (gathered node bounds) + masked leaf primitive
  tests.  Rays advance ``hit -> node+1``, ``miss/leaf -> skip[node]``; the
  loop ends when every ray's cursor passes the end.  Ordered DFS descent with
  a shrinking ``t_best`` is closest-hit-correct exactly like the reference's
  left-then-right clamped recursion.

* ``scan_all``: tiled all-pairs intersection (list.rs:20-31 closest-hit
  semantics).  Primitives are processed in contiguous tiles of ``SCAN_TILE``;
  each ``fori_loop`` step broadcasts one tile against the whole wavefront
  ([N_rays, TILE] lanes of pure VPU math — dynamic slices, **zero gathers**)
  and folds the per-tile argmin into the running best hit.  On the real TPU
  this measures ~77x faster than the gather-based BVH traversal on the
  3.4k-prim final scene (67 ms vs 5.1 s for a 90k-ray wavefront): per-ray
  divergent node cursors force [N]-sized gathers every traversal step, which
  is the pathological access pattern for a vector machine, while the dense
  tile sweep is contiguous broadcast compute at near-VPU-peak.  This is the
  default intersector for every reference scene (max ~3.4k prims).  Above
  ~30k prims auto switches to the cluster-culled sweep
  (ops/cluster_sweep.py); the measured crossover (tools/bench_crossover.py)
  shows gather-based traversal never winning at any scale up to 300k, so
  the BVH remains only as the forced 'bvh' parity mode.

Both return ``(t_best, prim_idx)`` with ``prim_idx == -1`` for a miss.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import PT_NONE, PT_RECT, PT_SPHERE
from .intersect import BIG, PrimFields, aabb_hit, gather_prim, \
    make_prim_intersector

# bf16 candidate hit tests (opt-in, DESIGN.md §10 / VERDICT item 6).
# Measured on TPU v5e (tools/bench_bf16.py): the [N, TILE] sphere fold runs
# ~2.1x faster in bf16 than f32 once the ~28 ms sync floor is subtracted
# (the VPU packs bf16 at (16, 128) native tiling).  bf16's 8 mantissa bits
# make the *selection* noisy (winners within ~0.5% relative t can swap, and
# decision-boundary hits can flip); the renderer therefore re-verifies the
# cross-tile winner's t in f32 (render.py bounce_step recompute), so the
# hit point / shading / next-ray origin are f32-exact for the selected
# primitive and only the selection itself carries bf16 noise.
#
# SPHERES ONLY — a rect bf16 path was built and rejected: the rect test IS
# its interval comparisons (a0 <= oa + t*da <= a1), and the t*da term's
# bf16 error is ~1% of the distance travelled, i.e. wall-edge jitter of
# ~5 world units on a 555-unit cornell wall — a visible artifact, unlike
# the sphere path's ~0.5%-of-local-radius silhouette noise.  Doing the
# interval math in f32 leaves rects with ~1 bf16-able op of 11; not worth
# a precision mode.  (Measured before the fix below, bf16-everything
# drifted the final scene by 3.5e-2 mean |dI|; sphere-only-with-f32-
# differences measures ~1e-3 — MC-noise scale.)
_BF = jnp.bfloat16
# NumPy (ml_dtypes) scalar, NOT jnp: a jnp scalar here would initialise
# the default accelerator backend as a side effect of *importing the
# library* — which hangs or faults when the tunneled TPU is unreachable,
# even for CPU-only runs that never touch it.
_BIG_BF = np.asarray(3.0e38, dtype=_BF)


def _sphere_bf16_core(center, radius, o32, d16, a16, inv_a16, t_min16,
                      t_max16):
    """bf16 sphere candidate t (sphere.rs:40-58 semantics): the ONE
    definition both bf16 paths share (the sweep's PrimFields tiles below
    and the cluster intersector's packed [*, 4] visits).

    The ray-center DIFFERENCE is computed in f32 and only then cast:
    rounding o and c to bf16 *before* subtracting makes the oc error scale
    with |o| (catastrophic cancellation — secondary rays sit ON geometry
    hundreds of units from the origin while |oc| to the next surface is
    O(1)).  Differencing first keeps every bf16 rounding relative to the
    LOCAL scale |oc|, so t errors stay ~0.5% of t.
    """
    r = radius.astype(_BF)  # [1, W]
    oc = (o32 - center).astype(_BF)  # [N, W, 3] f32 subtract, then cast
    half_b = (oc * d16).sum(-1)
    c2 = (oc * oc).sum(-1) - r * r
    disc = half_b * half_b - a16 * c2
    sq = jnp.sqrt(jnp.maximum(disc, _BF(0.0)))
    t_near = (-half_b - sq) * inv_a16
    t_far = (-half_b + sq) * inv_a16
    exists = disc >= _BF(0.0)
    ok1 = exists & (t_near >= t_min16) & (t_near <= t_max16)
    ok2 = exists & (t_far >= t_min16) & (t_far <= t_max16)
    return jnp.where(ok1, t_near, jnp.where(ok2, t_far, _BIG_BF))


def _sphere_tile_bf16(pf, o32, d16, a16, inv_a16, t_min16, t_max16):
    """PrimFields form of ``_sphere_bf16_core`` (the sweep's tiles)."""
    return _sphere_bf16_core(pf.p0, pf.radius, o32, d16, a16, inv_a16,
                             t_min16, t_max16)



# Primitive-tile width for the dense sweep: multiples of the 128-lane VPU
# register width; 512 measured fastest on TPU v5e (flat 256..2048).
SCAN_TILE = 512


def _scan_tile(n_prims: int) -> int:
    """Tile width: full VPU lanes when the scene is big enough, else the
    smallest sublane-aligned cover of the whole scene."""
    if n_prims >= SCAN_TILE:
        return SCAN_TILE
    return max(8, -(-n_prims // 8) * 8)


# Unroll guard: scenes whose type runs alternate pathologically fall back
# to uniform tiles rather than emitting hundreds of specialised bodies.
MAX_PLAN_TILES = 48


def type_runs(host_geom, n_prims: int):
    """Host-side (NumPy) maximal type-pure runs of the canonical order.

    Runs are split at primitive-TYPE / transform / plane-axis boundaries:
    the builder's canonical sort (scene.py:finalize) clusters primitives
    (e.g. final: 1006 spheres | 2401 rects grouped by axis | 2 media), so
    runs are maximal and single-type by construction.

    Only *structural* properties are inspected — integer type tags and the
    rotation/translation fields, none of which are trainable parameters —
    so a specialisation computed at trace time stays valid for every value
    of the differentiable scene parameters.

    Returns [(start, end, types, motion, xform, rect_axis)];
    ``rect_axis`` is the static plane tag for axis-pure rect runs, else
    None.
    """
    pt = np.asarray(host_geom.ptype)[:n_prims]
    rot = np.asarray(host_geom.rot)[:n_prims]
    trans = np.asarray(host_geom.trans)[:n_prims]
    p0 = np.asarray(host_geom.p0)[:n_prims]
    p1 = np.asarray(host_geom.p1)[:n_prims]
    eye = np.eye(3, dtype=rot.dtype)
    has_xf = np.any(rot != eye, axis=(1, 2)) | np.any(trans != 0, axis=1)
    moving = (pt == PT_SPHERE) & np.any(p0 != p1, axis=-1)

    # Run boundaries on (type, xform, plane axis) — motion interleaves
    # randomly in the grid scenes, so it stays a per-run "any" flag rather
    # than a key.
    axis = np.asarray(host_geom.axis)[:n_prims]
    key = (pt.astype(np.int64) * 8 + has_xf * 4
           + np.where(pt == PT_RECT, axis, 0))
    bounds = [0] + (np.flatnonzero(key[1:] != key[:-1]) + 1).tolist() \
        + [n_prims]
    runs = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        sl = slice(a, b)
        types = frozenset(int(v) for v in np.unique(pt[sl])) - {PT_NONE}
        rect_axis = None
        if types == {PT_RECT} and np.unique(axis[sl]).size == 1:
            rect_axis = int(axis[sl][0])
        runs.append((a, b, types, bool(moving[sl].any()),
                     bool(has_xf[sl].any()), rect_axis))
    return runs


def _tile_plan(host_geom, n_prims: int, max_tile: int, cuts=()):
    """Chunk the maximal type runs to ``max_tile`` for the unrolled sweep.

    Each tile compiles only one type's (and for rects one axis's)
    intersection math, and run-exact widths replace padding.
    ``cuts``: extra primitive indices tiles must not straddle (partition
    group boundaries — a tile belongs to at most one group).

    Returns [(start, width, types, motion, xform, rect_axis)] covering
    [0, n_prims).
    """
    pt = np.asarray(host_geom.ptype)[:n_prims]
    plan = []
    for a, b, types, _, _, rect_axis in type_runs(host_geom, n_prims):
        rot = np.asarray(host_geom.rot)[a:b]
        trans = np.asarray(host_geom.trans)[a:b]
        p0 = np.asarray(host_geom.p0)[a:b]
        p1 = np.asarray(host_geom.p1)[a:b]
        eye = np.eye(3, dtype=rot.dtype)
        has_xf = (np.any(rot != eye, axis=(1, 2))
                  | np.any(trans != 0, axis=1))
        moving = (pt[a:b] == PT_SPHERE) & np.any(p0 != p1, axis=-1)
        bounds = sorted({a, b} | {c for c in cuts if a < c < b})
        for a2, b2 in zip(bounds[:-1], bounds[1:]):
            for s in range(a2, b2, max_tile):
                w = min(max_tile, b2 - s)
                sl = slice(s - a, s - a + w)
                plan.append((
                    s, w, types,
                    bool(moving[sl].any()),
                    bool(has_xf[sl].any()),
                    rect_axis,
                ))
    return plan


def make_scan_intersector(static, host_geom=None, bf16=False,
                          part_groups=()):
    """``host_geom``: the NumPy geometry the runtime arrays will follow
    (same primitive order!).  When given, the tile loop is unrolled at trace
    time and each tile's intersection math is specialised to the primitive
    types / motion / transforms actually present in it.

    ``bf16``: compute candidate hit distances of static no-xform sphere
    tiles in bfloat16 (see the module-top bf16 notes — rects measured
    unviable; requires the planned path, i.e. ``host_geom``).  The returned
    t is always f32; the caller must re-verify the winner's t in f32
    (render.py does).

    ``part_groups`` (ops.partition.PartGroup tuple, planned path only):
    enables the partitioned call form ``scan_all(..., rows=...)`` where
    ``rows`` is a static per-group tuple of lane ranges — tiles belonging
    to a group fold only over that group's lane ranges (the wavefront was
    ordered by group overlap at the last compaction), every other tile
    folds over all lanes.  Fold order stays plan order per lane, so
    tie-break *policy* matches the full sweep.  NOT bit-identical to the
    full sweep, though: the same hit math compiled over sliced lane
    shapes picks different fp contractions (measured ~1 ulp of candidate
    t on CPU), and on a near-tie one flipped winner sends that sample
    down a different (equally valid) path.  Same statistical contract as
    the bf16 mode, at a far smaller scale (~0.1% of samples at 4 spp on
    the final scene); tests/test_partition.py bounds the image drift."""
    n_prims = static.n_prims
    tile = _scan_tile(n_prims)
    n_tiles = -(-n_prims // tile)
    p_pad = n_tiles * tile

    # Design note (measured on TPU v5e): an MXU matmul form of the sphere
    # tile (o.c / d.c as [N,3]@[3,P] products) is ~15% SLOWER end-to-end
    # than this vector form and costs ~100x the rounding error: a K=3
    # contraction uses 3/128 of the systolic array, f32 precision=HIGHEST
    # multiplies passes, and the cancellation in |o|^2 - 2 o.c + |c|^2
    # flips decision-boundary hits (~1e-3 t error vs ~1e-5).  The VPU
    # epilogue, not the dot products, is the roofline here.
    plan = None
    if host_geom is not None:
        cuts = tuple(c for g in part_groups for c in (g.start, g.end))
        raw = _tile_plan(host_geom, n_prims, SCAN_TILE, cuts)
        if len(raw) <= MAX_PLAN_TILES:
            plan = []
            for s, w, types, motion, xform, rect_axis in raw:
                bf_fn = None
                if bf16 and types == {PT_SPHERE} and not motion \
                        and not xform:
                    bf_fn = _sphere_tile_bf16
                plan.append((
                    s, w,
                    make_prim_intersector(static, types=types,
                                          has_motion=motion,
                                          has_xform=xform,
                                          rect_axis=rect_axis,
                                          assume_pure=True),
                    bf_fn,
                ))
        else:
            plan = None
    if plan is None:
        hit_t = make_prim_intersector(static)
    use_bf16 = bf16 and plan is not None and any(
        e[3] is not None for e in plan)

    def scan_all(geom, o, d, time, t_min, ray_bits, active, rows=None):
        if rows is not None and plan is None:
            raise ValueError("partitioned sweep requires the planned path")
        if plan is None and p_pad != n_prims:
            # Uniform-tile fallback pads to a whole number of tiles; the
            # planned path uses run-exact widths and needs no padding.
            def pad(x, fill):
                widths = [(0, p_pad - n_prims)] + [(0, 0)] * (x.ndim - 1)
                return jnp.pad(x, widths, constant_values=fill)

            geom = geom._replace(
                **{k: pad(getattr(geom, k),
                          PT_NONE if k == "ptype" else 0)
                   for k in PrimFields._fields})

        o_b = o[:, None, :]
        d_b = d[:, None, :]
        time_b = time[:, None]
        bits_b = ray_bits[:, None]
        if use_bf16:
            d16 = d_b.astype(_BF)
            a16 = (d16 * d16).sum(-1)  # [N, 1]
            inv_a16 = _BF(1.0) / a16
            t_min16 = jnp.asarray(t_min, _BF)

        # Derive loop carries from ray data so they are device-varying under
        # shard_map (constant inits would fail the scan carry type check).
        vary0 = o[..., 0] * 0.0
        t0 = jnp.where(active, BIG + vary0, jnp.float32(-BIG))
        best0 = vary0.astype(jnp.int32) - 1

        def tile_slice(start, width):
            sl = [jax.lax.dynamic_slice_in_dim(getattr(geom, k), start,
                                               width, 0)[None]
                  for k in PrimFields._fields]
            return PrimFields(*sl)

        def fold(start, t, t_best, best):
            # Ties break to the lowest primitive index (argmin picks the
            # first in-tile minimum; cross-tile, the strict < keeps the
            # earlier tile) — identical to the sequential list.rs order.
            j = jnp.argmin(t, axis=1).astype(jnp.int32)
            tt = jnp.min(t, axis=1)
            upd = tt < t_best
            return (jnp.where(upd, tt, t_best),
                    jnp.where(upd, start + j, best))

        def tile_step(start, width, t_best, best, hit_fn):
            pf = tile_slice(start, width)
            t = hit_fn(pf, o_b, d_b, time_b, t_min, t_best[:, None], bits_b,
                       jnp)  # [N, width]
            return fold(start, t, t_best, best)

        def tile_step_bf16(start, width, t_best, best, bf_fn):
            pf = tile_slice(start, width)
            t_max16 = t_best.astype(_BF)[:, None]
            t16 = bf_fn(pf, o_b, d16, a16, inv_a16, t_min16, t_max16)
            # Fold in f32: the per-tile argmin/min runs at bf16 rate (the
            # bulk of the fold cost); only the [N]-sized cross-tile
            # compare is upcast.
            j = jnp.argmin(t16, axis=1).astype(jnp.int32)
            tt = jnp.min(t16, axis=1).astype(jnp.float32)
            upd = tt < t_best
            return (jnp.where(upd, tt, t_best),
                    jnp.where(upd, start + j, best))

        def _splice(full, seg, r0, r1):
            parts = []
            if r0 > 0:
                parts.append(full[:r0])
            parts.append(seg)
            if r1 < full.shape[0]:
                parts.append(full[r1:])
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

        def tile_step_ranged(start, width, t_best, best, hit_fn, bf_fn,
                             ranges):
            """Fold one tile over static lane ranges only.  Lanes outside
            the ranges were proven (conservative AABB test at compaction,
            ops/partition.py) unable to hit any primitive in this tile's
            group, so skipping them cannot change any lane's winner."""
            pf = tile_slice(start, width)
            for r0, r1 in ranges:
                seg_t = t_best[r0:r1]
                seg_b = best[r0:r1]
                if use_bf16 and bf_fn is not None:
                    t16 = bf_fn(pf, o_b[r0:r1], d16[r0:r1], a16[r0:r1],
                                inv_a16[r0:r1], t_min16,
                                seg_t.astype(_BF)[:, None])
                    j = jnp.argmin(t16, axis=1).astype(jnp.int32)
                    tt = jnp.min(t16, axis=1).astype(jnp.float32)
                else:
                    t = hit_fn(pf, o_b[r0:r1], d_b[r0:r1], time_b[r0:r1],
                               t_min, seg_t[:, None], bits_b[r0:r1], jnp)
                    j = jnp.argmin(t, axis=1).astype(jnp.int32)
                    tt = jnp.min(t, axis=1)
                upd = tt < seg_t
                t_best = _splice(t_best, jnp.where(upd, tt, seg_t), r0, r1)
                best = _splice(best, jnp.where(upd, start + j, seg_b),
                               r0, r1)
            return t_best, best

        if plan is not None:
            # Unrolled: each run-aligned tile gets its own specialised
            # intersection code (see _tile_plan).
            from .partition import rows_for_tile

            t_best, best = t0, best0
            for start, width, hit_fn, bf_fn in plan:
                ranges = (rows_for_tile(part_groups, rows, start)
                          if rows is not None else None)
                if ranges is not None:
                    t_best, best = tile_step_ranged(start, width, t_best,
                                                    best, hit_fn, bf_fn,
                                                    ranges)
                elif use_bf16 and bf_fn is not None:
                    t_best, best = tile_step_bf16(start, width, t_best,
                                                  best, bf_fn)
                else:
                    t_best, best = tile_step(start, width, t_best, best,
                                             hit_fn)
        else:
            def body(i, carry):
                return tile_step(i * tile, tile, carry[0], carry[1], hit_t)

            t_best, best = jax.lax.fori_loop(0, n_tiles, body, (t0, best0))
        t_best = jnp.where(active, t_best, BIG)
        return t_best, best

    # Callers must not pass rows when the plan fell back (too many tiles):
    # render.make_ray_colorer drops its partition groups on this flag.
    scan_all.planned = plan is not None
    return scan_all


def make_bvh_traverser(static, leaf_size: int):
    hit_t = make_prim_intersector(static)

    def traverse(bvh, geom, o, d, time, t_min, ray_bits, active):
        n_nodes = bvh.skip.shape[0]
        inv_d = 1.0 / d

        # Carries derived from ray data: device-varying under shard_map.
        ivary0 = (o[..., 0] * 0.0).astype(jnp.int32)
        node0 = jnp.where(active, ivary0, n_nodes).astype(jnp.int32)
        t_best0 = ivary0.astype(jnp.float32) + BIG
        best0 = ivary0 - 1

        def cond(carry):
            node, _, _ = carry
            return jnp.any(node < n_nodes)

        def body(carry):
            node, t_best, best = carry
            live = node < n_nodes
            nd = jnp.where(live, node, 0)

            bmin = bvh.bounds_min[nd]
            bmax = bvh.bounds_max[nd]
            hit = aabb_hit(bmin, bmax, o, inv_d, t_min, t_best, jnp) & live

            lf = bvh.leaf_first[nd]
            lc = bvh.leaf_count[nd]
            is_leaf = lf >= 0
            do_leaf = hit & is_leaf

            # Masked leaf tests, statically unrolled over the leaf slots.
            # geom is padded with PT_NONE slots so pid is always in range.
            lf_safe = jnp.where(do_leaf, lf, geom.ptype.shape[0] - leaf_size)
            for j in range(leaf_size):
                pid = lf_safe + j
                pf = gather_prim(geom, pid)
                t = hit_t(pf, o, d, time, t_min, t_best, ray_bits, jnp)
                upd = do_leaf & (j < lc) & (t < t_best)
                t_best = jnp.where(upd, t, t_best)
                best = jnp.where(upd, pid, best)

            nxt = jnp.where(hit & ~is_leaf, nd + 1, bvh.skip[nd])
            node = jnp.where(live, nxt, node)
            return node, t_best, best

        _, t_best, best = jax.lax.while_loop(
            cond, body, (node0, t_best0, best0)
        )
        return t_best, best

    return traverse


def make_intersector(static, *, bvh_mode: bool, leaf_size: int = 4,
                     host_geom=None, bf16=False, part_groups=()):
    """Unified interface: trace(geom, bvh, o, d, time, t_min, ray_bits,
    active, rows=None) -> (t, prim).

    ``host_geom`` (scan path only): NumPy geometry in the runtime primitive
    order, enabling per-tile type specialisation of the dense sweep.
    ``bf16`` (scan path only): bf16 candidate hit tests (module-top notes).
    ``part_groups`` (scan path only): enables the ``rows`` argument — the
    statically-ranged partitioned sweep (make_scan_intersector)."""
    if bvh_mode:
        trav = make_bvh_traverser(static, leaf_size)

        def trace(geom, bvh, o, d, time, t_min, ray_bits, active,
                  rows=None):
            assert rows is None, "BVH traversal has no partitioned form"
            return trav(bvh, geom, o, d, time, t_min, ray_bits, active)

        trace.planned = False
    else:
        scan = make_scan_intersector(static, host_geom, bf16=bf16,
                                     part_groups=part_groups)

        def trace(geom, bvh, o, d, time, t_min, ray_bits, active,
                  rows=None):
            return scan(geom, o, d, time, t_min, ray_bits, active, rows)

        trace.planned = scan.planned
    return trace
