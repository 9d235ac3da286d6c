"""Lane partitioning by primitive-group AABB overlap (cluster culling
folded into the compaction permutation).

The dense sweep tests every (ray, primitive) pair.  Most scenes hide a
cheaper structure: a few large, spatially compact primitive groups (the
final scene's 1000-sphere rotated cloud is 71% of its primitives, yet only
5-22% of ray segments overlap its AABB — measured per bounce on the final
target).  The wavefront already pays a full permutation at every
compaction milestone; ordering the surviving lanes by *which group AABBs
their next segment overlaps* makes each group's sweep tiles run on a
static prefix/slice of the wavefront instead of all lanes — the pruning
role of the reference's BVH interior nodes
(/root/reference/src/hittable/bvh_node.rs:104-127), restructured as a
dense partitioned sweep instead of a per-ray tree walk.

Layout contract (G groups, C = 2**G categories): alive lanes are ordered
by descending overlap mask (group 0 = highest bit), each category padded
to a static per-milestone bucket; dead/overflow lanes are packed into a
static drop region after the live categories.  Group 0's lanes are then
the prefix [0, B[0]+B[1]); group 1's lanes are <= 2 static ranges.  Hole
lanes (bucket padding) replicate lane 0 but carry alive=False, zero
radiance, and slot -1, so they can never contribute (render.py
compact_wavefront_part).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

# A cullable group must be a whole type run (tiles never straddle runs)
# with at least this many primitives — below that the sweep work it could
# save is smaller than the extra cumsum/bookkeeping of one category.
PART_MIN_PRIMS = 128
# Lane floor for partitioned milestones: below this the whole sweep is
# cheap enough that per-category packing overhead wins nothing (the
# existing plain compaction / rolled tail takes over).
PART_MIN_LANES = 65536
# Two groups = four categories.  More groups square the category count
# and the third-largest run is already small in every reference scene.
MAX_GROUPS = 2


class PartGroup(NamedTuple):
    start: int  # primitive range [start, end) in canonical order
    end: int
    # [3] union world AABB over the shutter window, as plain float tuples
    # so a PartGroup is hashable (usable as a jit static argument).
    bmin: Tuple[float, float, float]
    bmax: Tuple[float, float, float]
    # True when every member is an axis-aligned center/corner primitive
    # with identity transform (spheres incl. moving/media — transforms
    # bake into centers — and boxes): then the union AABB can be
    # recomputed ON DEVICE from the current p0/p1/radius, which is what
    # partitioned TRAINING needs (the baked bmin/bmax go stale the moment
    # an optimizer moves a center).  Rect groups keep False.
    dynamic_ok: bool = False


def _trim_run(amin, amax, a: int, b: int):
    """Shrink [a, b) from one edge if a few outlier primitives inflate the
    union AABB (e.g. the final scene's 6 hero spheres share a type run
    with the 1000-sphere cloud because sphere transforms bake into the
    center; dropping them shrinks the union volume ~15x).  Keeps >= 80%
    of the run; trims only on a >= 4x volume reduction."""
    size = b - a
    keep = max(PART_MIN_PRIMS, (size * 4) // 5)
    max_trim = size - keep
    if max_trim <= 0:
        return a, b

    def vol(mn, mx):
        e = np.maximum(mx - mn, 0.0)
        return float(e[..., 0] * e[..., 1] * e[..., 2])

    # Suffix unions (front trims) and prefix unions (back trims).
    suf_mn = np.minimum.accumulate(amin[a:b][::-1], 0)[::-1]
    suf_mx = np.maximum.accumulate(amax[a:b][::-1], 0)[::-1]
    pre_mn = np.minimum.accumulate(amin[a:b], 0)
    pre_mx = np.maximum.accumulate(amax[a:b], 0)
    v0 = vol(suf_mn[0], suf_mx[0])
    best = (a, b, v0)
    for k in range(1, max_trim + 1):
        vf = vol(suf_mn[k], suf_mx[k])
        if vf < best[2]:
            best = (a + k, b, vf)
        vb = vol(pre_mn[size - 1 - k], pre_mx[size - 1 - k])
        if vb < best[2]:
            best = (a, b - k, vb)
    a2, b2, v = best
    return (a2, b2) if v * 4.0 <= v0 else (a, b)


def partition_groups(host_geom, n_prims: int) -> Tuple[PartGroup, ...]:
    """Pick up to MAX_GROUPS cullable primitive runs (host-side).

    Groups are (edge-trimmed) maximal type runs of >= PART_MIN_PRIMS
    primitives, largest first — group order is bit priority: group 0 gets
    the contiguous lane prefix.  make_scan_intersector splits sweep tiles
    at group boundaries so a tile never straddles one.  Selection looks
    only at structural fields and baked AABBs, which do not change under
    the *shading* parameters; geometry training uses the unpartitioned
    paths (train.py).
    """
    from .bvh import type_runs

    amin = np.asarray(host_geom.aabb_min)
    amax = np.asarray(host_geom.aabb_max)
    runs = []
    for a, b, *_ in type_runs(host_geom, n_prims):
        if b - a >= PART_MIN_PRIMS:
            runs.append(_trim_run(amin, amax, a, b))
    runs = [r for r in runs if r[1] - r[0] >= PART_MIN_PRIMS]
    runs.sort(key=lambda r: r[0] - r[1])  # largest first
    from .intersect import (
        PT_BOX,
        PT_MEDIUM_SPHERE,
        PT_SPHERE,
    )

    pt = np.asarray(host_geom.ptype)
    rot = np.asarray(host_geom.rot)
    trans = np.asarray(host_geom.trans)
    eye = np.eye(3, dtype=rot.dtype)
    gs = []
    for a, b in runs[:MAX_GROUPS]:
        dyn = bool(
            np.isin(pt[a:b], [PT_SPHERE, PT_MEDIUM_SPHERE, PT_BOX]).all()
            and (rot[a:b] == eye).all() and (trans[a:b] == 0).all())
        gs.append(PartGroup(
            int(a), int(b),
            tuple(float(v) for v in amin[a:b].min(0).astype(np.float32)),
            tuple(float(v) for v in amax[a:b].max(0).astype(np.float32)),
            dyn))
    return tuple(gs)


def device_group_aabbs(groups, geom, xp):
    """Per-group (bmin, bmax) recomputed from the CURRENT geometry.

    Valid only for groups with ``dynamic_ok`` (axis-aligned center/corner
    primitives, identity transform): the union of min(p0, p1) - r and
    max(p0, p1) + r covers spheres (static, moving, media — the two
    centers bound the shutter sweep) and boxes (r = 0, corners p0/p1)
    for every value of the trainable p0/p1/radius.
    """
    out = []
    for g in groups:
        assert g.dynamic_ok, "group has no device-computable AABB"
        p0 = geom.p0[g.start:g.end]
        p1 = geom.p1[g.start:g.end]
        # |radius|: hollow spheres are built with NEGATIVE radius
        # (builders.py random-scene glass shell; the hit test uses r^2,
        # the baked AABBs abs(r)) — max(r) would under-cover them.
        r_max = xp.max(xp.abs(geom.radius[g.start:g.end]))
        out.append((xp.minimum(p0, p1).min(0) - r_max,
                    xp.maximum(p0, p1).max(0) + r_max))
    return out


def overlap_masks(groups, o, d, xp, aabbs=None):
    """[N, G] conservative ray-vs-group-AABB overlap (t in (0, inf)).

    Conservative variant of ops.intersect.aabb_hit: |d| components are
    floored (axis-parallel rays on a slab plane produce a huge finite
    interval -> overlap True, never a NaN miss), the comparison is
    non-strict, and the box is dilated by a relative epsilon so the
    rounding of the two slab products cannot shrink the interval past a
    primitive lying exactly on the union's face.  A false *negative* —
    which would silently skip a real hit — is thus excluded at fp level,
    not just for exact ties; false positives only cost sweep work.

    ``aabbs``: optional per-group (bmin, bmax) device arrays (training:
    device_group_aabbs) overriding the baked static boxes.
    """
    d_safe = xp.where(xp.abs(d) < 1e-20, 1e-20, d)
    inv = 1.0 / d_safe
    cols = []
    for i, g in enumerate(groups):
        if aabbs is not None:
            bmin, bmax = aabbs[i]
        else:
            bmin = np.asarray(g.bmin, np.float32)
            bmax = np.asarray(g.bmax, np.float32)
        pad = 1e-5 * (bmax - bmin) + 1e-6
        t0 = (bmin - pad - o) * inv
        t1 = (bmax + pad - o) * inv
        lo = xp.minimum(t0, t1).max(-1)
        hi = xp.maximum(t0, t1).min(-1)
        cols.append((hi >= lo) & (hi >= 0.0))
    return xp.stack(cols, axis=-1)


def lane_layout_cat(groups, o, d, xp, aabbs=None):
    """Layout position in [0, C) per lane: C-1-mask, mask bit (G-1-i) =
    overlaps group i — i.e. categories ordered by descending mask, group
    0 in the prefix."""
    G = len(groups)
    C = 1 << G
    if G == 0:  # degenerate single category: plain compaction layout
        return xp.zeros(o.shape[:1], xp.int32)
    m = overlap_masks(groups, o, d, xp, aabbs=aabbs)
    mask = None
    for i in range(G):
        bit = m[:, i].astype(xp.int32) << (G - 1 - i)
        mask = bit if mask is None else mask | bit
    return (C - 1) - mask


def group_rows(groups, buckets) -> Tuple[Tuple[Tuple[int, int], ...], ...]:
    """Static lane ranges per group for a bucket layout.

    buckets: per-category sizes in layout order (len C).  Returns, per
    group, a tuple of (row_start, row_end) ranges (adjacent ranges
    merged, empty buckets dropped) covering exactly the categories whose
    mask has that group's bit set.
    """
    G = len(groups)
    C = len(buckets)
    offs = np.concatenate([[0], np.cumsum(buckets)]).astype(int)
    out = []
    for i in range(G):
        rs = []
        for p in range(C):
            mask = (C - 1) - p
            if (mask >> (G - 1 - i)) & 1 and buckets[p] > 0:
                r = (int(offs[p]), int(offs[p + 1]))
                if rs and rs[-1][1] == r[0]:
                    rs[-1] = (rs[-1][0], r[1])
                else:
                    rs.append(r)
        out.append(tuple((int(a), int(b)) for a, b in rs))
    return tuple(out)


def rows_for_tile(groups, rows, tile_start: int):
    """The row ranges a sweep tile must fold over, or None for all lanes
    (tiles outside every group)."""
    for g, r in zip(groups, rows):
        if g.start <= tile_start < g.end:
            return r
    return None
