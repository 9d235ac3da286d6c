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

* ``scan_all``: O(P) loop testing every primitive against every ray
  (list.rs:20-31 semantics).  No gathers, pure VPU math — faster than the
  BVH for small scenes and the correctness oracle for the traversal.

Both return ``(t_best, prim_idx)`` with ``prim_idx == -1`` for a miss.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import BIG, aabb_hit, gather_prim, make_prim_intersector


def make_scan_intersector(static):
    hit_t = make_prim_intersector(static)
    n_prims = static.n_prims

    def scan_all(geom, o, d, time, t_min, ray_bits, active):
        # Derive loop carries from ray data so they are device-varying under
        # shard_map (constant inits would fail the scan carry type check).
        vary0 = o[..., 0] * 0.0
        t0 = jnp.where(active, BIG + vary0, jnp.float32(-BIG))

        def body(p, carry):
            t_best, best = carry
            pf = gather_prim(geom, p)
            t = hit_t(pf, o, d, time, t_min, t_best, ray_bits, jnp)
            upd = t < t_best
            return jnp.where(upd, t, t_best), jnp.where(upd, p, best)

        t_best, best = jax.lax.fori_loop(
            0, n_prims, body,
            (t0, vary0.astype(jnp.int32) - 1),
        )
        t_best = jnp.where(active, t_best, BIG)
        return t_best, best

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


def make_intersector(static, *, use_bvh: bool, leaf_size: int = 4):
    """Unified interface: trace(geom, bvh, o, d, time, t_min, ray_bits,
    active) -> (t, prim)."""
    if use_bvh:
        trav = make_bvh_traverser(static, leaf_size)

        def trace(geom, bvh, o, d, time, t_min, ray_bits, active):
            return trav(bvh, geom, o, d, time, t_min, ray_bits, active)

    else:
        scan = make_scan_intersector(static)

        def trace(geom, bvh, o, d, time, t_min, ray_bits, active):
            return scan(geom, o, d, time, t_min, ray_bits, active)

    return trace
