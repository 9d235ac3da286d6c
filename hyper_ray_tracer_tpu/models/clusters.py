"""Spatial primitive clusters for the tile-culled sweep (ops/cluster_sweep).

This is the TPU-native replacement for the pruning role of the reference's
BVH (`/root/reference/src/hittable/bvh_node.rs:104-127`): instead of a
per-ray tree descent (whose divergent node cursors force pathological
gathers on a vector machine), primitives are grouped host-side into compact
spatial clusters, and the renderer culls whole clusters per *ray tile*
(coherent rays share their cluster working set, so the test is a dense
[rays, clusters] slab sweep and primitive access stays a contiguous
``dynamic_slice``).

Build policy mirrors the reference's BVH build (`bvh_node.rs:27-100`):
recursive median split on the axis with the widest centroid extent, sorted
by ``aabb.min + aabb.max``.  Splitting happens *within* each type-pure run
of the canonical primitive order (scene.py:finalize), so every cluster is
single-type (single plane axis for rects) and the per-cluster sweep compiles
fully specialised intersection math.

Cluster slots are padded to a uniform per-run width so the device can slice
any cluster with one static-width ``dynamic_slice``.  Pad slots carry NaN
geometry: every intersection test's accept mask compares against NaN and
comes out False, so pads can never hit anything, never win the closest-hit
fold, and never receive gradients (no duplicate-primitive aliasing).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import numpy as np

from ..ops.bvh import type_runs
from .scene import PT_NONE, GeometrySoA

# Runs smaller than this stay in the always-swept tail (the culling
# bookkeeping would cost more than the saved pair tests).
CLUSTER_MIN_RUN = 256

# Target primitives per cluster — the measured sweet spot
# (tools/tune_clusters.py, TPU v5e, compacted depth-10 renders):
#
#   66k-sphere flake:  256/cluster 869 ms | 136-wide 1128 | 72-wide 1601
#   598k-sphere flake: 2336-wide 8826 ms | 584-wide 6101 |
#                      296-wide 6075 | 152-wide 6059  (plateau ~6.1 s)
#
# Narrower clusters multiply visit-loop trips (each a dynamic_slice +
# fold with near-fixed overhead); wider ones sweep dead pairs.  Each
# run's cluster count is the power of two closest to count/TARGET.
CLUSTER_TARGET_PRIMS = 256

# Hard cap on clusters per type run: bounds the per-tile Phase A slab
# work and the visit-loop trip ceiling.  Round 2 capped at 256 because
# Phase A materialised a dense [N, C] matrix; Phase A is now chunked per
# ray tile above ~2^28 ray-cluster pairs (ops/cluster_sweep.py), so the
# cap can follow the measured plateau instead.
MAX_CLUSTERS_PER_RUN = 4096


class ClusterRun(NamedTuple):
    """One type-pure run of clusters in the padded geometry layout."""

    base: int  # first padded slot of this run
    n_clusters: int
    width: int  # padded slots per cluster (multiple of 8)
    types: frozenset  # single PT_* tag
    has_motion: bool
    has_xform: bool
    rect_axis: Optional[int]
    cmin: np.ndarray  # [n_clusters, 3] cluster AABB (world, shutter union)
    cmax: np.ndarray  # [n_clusters, 3]
    # Smallest |radius| over the run's members (spheres; 0.0 otherwise).
    # Diagnostic metadata: it powered the round-4 bf16 resolvability
    # experiment (DESIGN.md §14 — the mode was removed by measurement)
    # and stays for layout introspection.
    rmin_abs: float = 0.0


class ClusterLayout(NamedTuple):
    runs: Tuple[ClusterRun, ...]
    # Always-swept tail, same entry shape as ops.bvh._tile_plan:
    # (start, width, types, motion, xform, rect_axis) in padded-slot coords.
    tail: Tuple[tuple, ...]
    n_slots: int  # total padded geometry length
    src: np.ndarray  # [n_slots] canonical-order source index; -1 = pad


def _median_split(ids: np.ndarray, centers2: np.ndarray,
                  max_leaf: int) -> list:
    """Recursive median split (bvh_node.rs:27-63 policy) until every leaf
    has <= max_leaf primitives (real leaf sizes land in
    (max_leaf/2, max_leaf]).  ``centers2`` = aabb_min + aabb_max."""
    out = []

    def rec(sub):
        if sub.shape[0] <= max_leaf:
            out.append(sub)
            return
        ext = centers2[sub]
        axis = int(np.argmax(ext.max(0) - ext.min(0)))  # widest extent
        order = np.argsort(ext[:, axis], kind="stable")
        sub = sub[order]
        h = sub.shape[0] // 2
        rec(sub[:h])
        rec(sub[h:])

    rec(ids)
    return out


def cluster_eligible(geom: GeometrySoA, n_prims: int) -> bool:
    """True when at least one type run is big enough to benefit."""
    return any(b - a >= CLUSTER_MIN_RUN
               for a, b, *_ in type_runs(geom, n_prims))


def build_clusters(geom: GeometrySoA,
                   n_prims: int) -> Tuple[GeometrySoA, ClusterLayout]:
    """Re-emit ``geom`` (canonical order, NumPy) in padded cluster order.

    Returns (padded_geom, layout).  Big type runs become spatial clusters;
    small runs (media, feature objects, lights) go to the always-swept tail
    in their original relative order.
    """
    amin = np.asarray(geom.aabb_min)[:n_prims]
    amax = np.asarray(geom.aabb_max)[:n_prims]
    centers2 = amin + amax

    runs_out = []
    tail_out = []
    src_parts = []
    cursor = 0
    for a, b, types, motion, xform, rect_axis in type_runs(geom, n_prims):
        count = b - a
        if count < CLUSTER_MIN_RUN:
            tail_out.append((cursor, count, types, motion, xform, rect_axis))
            src_parts.append(np.arange(a, b, dtype=np.int64))
            cursor += count
            continue
        n_target = 1 << max(0, round(math.log2(
            max(count / CLUSTER_TARGET_PRIMS, 1.0))))
        n_target = min(n_target, MAX_CLUSTERS_PER_RUN)
        max_leaf = -(-count // n_target)
        leaves = _median_split(np.arange(a, b, dtype=np.int64), centers2,
                               max_leaf)
        width = -(-max(len(lv) for lv in leaves) // 8) * 8
        cmin = np.stack([amin[lv].min(0) for lv in leaves])
        cmax = np.stack([amax[lv].max(0) for lv in leaves])
        for lv in leaves:
            pad = np.full(width - len(lv), -1, np.int64)
            src_parts.append(np.concatenate([lv, pad]))
        radii = np.abs(np.asarray(geom.radius)[a:b])
        runs_out.append(ClusterRun(
            base=cursor, n_clusters=len(leaves), width=width,
            types=types, has_motion=motion, has_xform=xform,
            rect_axis=rect_axis,
            cmin=cmin.astype(np.float32), cmax=cmax.astype(np.float32),
            rmin_abs=float(radii.min()) if radii.size else 0.0,
        ))
        cursor += len(leaves) * width

    src = np.concatenate(src_parts) if src_parts else np.empty(0, np.int64)
    assert src.shape[0] == cursor
    is_pad = src < 0
    take = np.where(is_pad, 0, src)

    def f32(field):
        out = np.asarray(field)[take].astype(np.float32, copy=True)
        out[is_pad] = np.nan  # NaN compares False everywhere -> never hits
        return out

    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (cursor, 3, 3))
    padded = GeometrySoA(
        ptype=np.where(is_pad, PT_NONE,
                       np.asarray(geom.ptype)[take]).astype(np.int32),
        stable_id=np.where(is_pad, 0,
                           np.asarray(geom.stable_id)[take]).astype(np.int32),
        p0=f32(geom.p0),
        p1=f32(geom.p1),
        radius=f32(geom.radius),
        axis=np.asarray(geom.axis)[take].astype(np.int32, copy=True),
        time0=f32(geom.time0),
        time1=f32(geom.time1),
        neg_inv_density=f32(geom.neg_inv_density),
        material=np.where(is_pad, 0,
                          np.asarray(geom.material)[take]).astype(np.int32),
        # Identity rotation for pads (NaN p0/trans already guarantee a
        # miss); empty AABB so any consumer of bounds skips pads.
        rot=np.where(is_pad[:, None, None], eye,
                     np.asarray(geom.rot)[take]).astype(np.float32),
        trans=f32(geom.trans),
        aabb_min=np.where(is_pad[:, None], np.float32(np.inf),
                          np.asarray(geom.aabb_min)[take]).astype(np.float32),
        aabb_max=np.where(is_pad[:, None], np.float32(-np.inf),
                          np.asarray(geom.aabb_max)[take]).astype(np.float32),
    )
    layout = ClusterLayout(
        runs=tuple(runs_out), tail=tuple(tail_out), n_slots=cursor,
        src=src,
    )
    return padded, layout
