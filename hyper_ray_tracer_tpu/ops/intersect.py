"""Branch-free primitive intersection.

Replaces the reference's per-type ``Hittable::hit`` dynamic dispatch
(`/root/reference/src/hittable/`) with masked all-compute over gathered
SoA fields: every ray computes candidate hit distances for the primitive's
possible types and selects by the integer tag.  Specialisation flags from
``SceneStatic`` (motion / media / transforms present) prune dead lanes at
trace time, so e.g. a scene with no media pays nothing for medium code.

All functions are xp-generic (NumPy scalar oracle + jax.numpy renderer).

Semantics sources:
  sphere      sphere.rs:40-75 (half_b quadratic, nearer root first,
                               inclusive [t_min, t_max] bounds)
  moving      moving_sphere.rs:53-95 (center lerped at ray.time)
  rect        rect.rs:53-86   (axis permutation table, inclusive bounds)
  box         cuboid.rs:31-88 (solid cuboid = 6-rect List; intersected as
                               ONE slab interval — the closest in-range
                               interval endpoint IS the closest face-rect
                               hit; see box_t)
  medium      constant_medium.rs:34-76 (entry/exit + exponential free flight)
  aabb        aabb.rs:20-47   (slab test, t_max <= t_min -> miss)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..models.scene import (
    PLANE_AXES,
    PT_BOX,
    PT_MEDIUM_BOX,
    PT_MEDIUM_SPHERE,
    PT_RECT,
    PT_SPHERE,
)
from . import rng as prng
from .math import sqrt_capped_grad

BIG = np.float32(3.0e38)  # sentinel "miss" distance (finite: avoids inf-inf)
MEDIUM_REHIT_EPS = np.float32(1.0e-4)  # constant_medium.rs:38


class PrimFields(NamedTuple):
    """Per-ray gathered primitive fields (leading shape B broadcastable)."""

    ptype: np.ndarray  # [B] int32
    stable_id: np.ndarray  # [B] int32 ordering-independent id (RNG salt)
    p0: np.ndarray  # [B,3]
    p1: np.ndarray  # [B,3]
    radius: np.ndarray  # [B]
    axis: np.ndarray  # [B] int32
    time0: np.ndarray  # [B]
    time1: np.ndarray  # [B]
    neg_inv_density: np.ndarray  # [B]
    rot: np.ndarray  # [B,3,3]
    trans: np.ndarray  # [B,3]


def gather_prim(geom, idx) -> PrimFields:
    """Gather a PrimFields view for primitive indices ``idx`` (any shape)."""
    return PrimFields(
        ptype=geom.ptype[idx],
        stable_id=geom.stable_id[idx],
        p0=geom.p0[idx],
        p1=geom.p1[idx],
        radius=geom.radius[idx],
        axis=geom.axis[idx],
        time0=geom.time0[idx],
        time1=geom.time1[idx],
        neg_inv_density=geom.neg_inv_density[idx],
        rot=geom.rot[idx],
        trans=geom.trans[idx],
    )


def pack_prim(geom, xp):
    """Pack the per-prim fields into two row matrices for winner gathers.

    Measured on TPU v5e at 1.44M rays: a per-field gather costs ~9 ns/elem
    (25 scalar fields -> ~240 ms/bounce) while ONE [N, K] row gather costs
    about the same as a single scalar gather (~2 ms).  The per-bounce
    winner access therefore packs the 22 float and 4 int per-prim fields
    into [P, 22] f32 + [P, 4] i32 and gathers each once per bounce.

    Packing is a concat over [P]-sized arrays (trivial next to the ray
    work) and is linear, so gradients flow through to every geometry field
    exactly as with per-field gathers.
    """
    f = xp.concatenate(
        [
            geom.p0,
            geom.p1,
            geom.radius[:, None],
            geom.time0[:, None],
            geom.time1[:, None],
            geom.neg_inv_density[:, None],
            geom.rot.reshape(-1, 9),
            geom.trans,
        ],
        axis=-1,
    )
    i = xp.stack(
        [geom.ptype, geom.stable_id, geom.material, geom.axis], axis=-1
    )
    return f, i


def _unpack_prim(g, gi) -> PrimFields:
    """Slice gathered pack rows back into PrimFields (prefix columns)."""
    return PrimFields(
        ptype=gi[..., 0],
        stable_id=gi[..., 1],
        p0=g[..., 0:3],
        p1=g[..., 3:6],
        radius=g[..., 6],
        axis=gi[..., 3],
        time0=g[..., 7],
        time1=g[..., 8],
        neg_inv_density=g[..., 9],
        rot=g[..., 10:19].reshape(*g.shape[:-1], 3, 3),
        trans=g[..., 19:22],
    )


def gather_prim_packed(fpack, ipack, idx):
    """Row-gather packed prim fields; returns (PrimFields, material_idx)."""
    g = fpack[idx]
    gi = ipack[idx]
    return _unpack_prim(g, gi), gi[..., 2]


class ShadeFields(NamedTuple):
    """Per-ray material+texture fields, star-joined into the prim pack.

    The reference walks pointer chains at shade time (hit_record ->
    Arc<dyn Material> -> Arc<dyn Texture>, materials/mod.rs); the wavefront
    renderer instead denormalises both tables into the primitive rows so
    the winner gather fetches everything at once.
    """

    mtype: np.ndarray  # [B] int32
    ttype: np.ndarray  # [B] int32
    image_id: np.ndarray  # [B] int32
    fuzz: np.ndarray  # [B]
    ior: np.ndarray  # [B]
    albedo: np.ndarray  # [B,3] (metal)
    color1: np.ndarray  # [B,3] (solid / checker odd)
    color2: np.ndarray  # [B,3] (checker even)
    scale: np.ndarray  # [B] (noise)


def shade_pack_layout(static):
    """[(field, width)] float columns of the joined shade pack, specialised
    by the scene's static flags: a field no consumer can touch under this
    specialisation is not packed, not gathered, and comes back ``None``
    (so an unguarded access fails loudly instead of reading garbage).
    The final scene drops rot/trans/color2 — 15 of 34 float columns of
    winner-gather bandwidth."""
    from ..models.scene import MT_DIELECTRIC, MT_METAL

    mats = set(static.mat_types)
    cols = [("p0", 3), ("p1", 3), ("radius", 1)]
    if static.has_motion:
        cols += [("time0", 1), ("time1", 1)]
    if static.has_media:
        cols += [("neg_inv_density", 1)]
    if static.has_ray_xform:
        cols += [("rot", 9), ("trans", 3)]
    if MT_METAL in mats:
        cols += [("fuzz", 1), ("albedo", 3)]
    if MT_DIELECTRIC in mats:
        cols += [("ior", 1)]
    cols += [("color1", 3)]
    if static.has_checker_tex:
        cols += [("color2", 3)]
    if static.has_noise_tex:
        cols += [("scale", 1)]
    return cols


def pack_prim_shade(arrays, static, xp):
    """Flag-specialised prim pack plus a [P]-sized star-join of
    material/texture rows.

    Measured on TPU v5e (tools/prof_bounce2.py, 1.44M-ray final scene):
    the shade phase's four separate table gathers (materials x2,
    textures x2) dominate its +43 ms in-bounce cost, while widening the
    single winner row gather is comparatively free.  Every
    material/texture field a bounce can need under this scene's
    specialisation is therefore joined into the primitive pack — the join
    runs over [P]-sized arrays and is hoisted out of the bounce scan by
    XLA — so ONE row gather per bounce fetches geometry, material, and
    texture together.  Column layout: ``shade_pack_layout(static)``
    floats + 7 fixed ints."""
    geom = arrays.geom
    mats, texs = arrays.materials, arrays.textures
    m = geom.material
    t = mats.texture[m]
    src = {
        "p0": geom.p0,
        "p1": geom.p1,
        "radius": geom.radius[:, None],
        "time0": geom.time0[:, None],
        "time1": geom.time1[:, None],
        "neg_inv_density": geom.neg_inv_density[:, None],
        "rot": geom.rot.reshape(-1, 9),
        "trans": geom.trans,
        "fuzz": mats.fuzz[m][:, None],
        "albedo": mats.albedo[m],
        "ior": mats.ior[m][:, None],
        "color1": texs.color1[t],
        "color2": texs.color2[t],
        "scale": texs.scale[t][:, None],
    }
    f = xp.concatenate(
        [src[name] for name, _ in shade_pack_layout(static)], axis=-1
    )
    i = xp.stack(
        [geom.ptype, geom.stable_id, geom.material, geom.axis,
         mats.mtype[m], texs.ttype[t], texs.image_id[t]],
        axis=-1,
    )
    return f, i


def gather_prim_shade_packed(fpack, ipack, idx, static):
    """Row-gather the joined pack: (PrimFields, material_idx, ShadeFields).

    Fields absent from this scene's ``shade_pack_layout`` come back
    ``None``."""
    g = fpack[idx]
    gi = ipack[idx]
    vals = {}
    off = 0
    for name, w in shade_pack_layout(static):
        vals[name] = g[..., off] if w == 1 else g[..., off:off + w]
        off += w
    rot = vals.get("rot")
    if rot is not None:
        rot = rot.reshape(*g.shape[:-1], 3, 3)
    pf = PrimFields(
        ptype=gi[..., 0],
        stable_id=gi[..., 1],
        p0=vals["p0"],
        p1=vals["p1"],
        radius=vals["radius"],
        axis=gi[..., 3],
        time0=vals.get("time0"),
        time1=vals.get("time1"),
        neg_inv_density=vals.get("neg_inv_density"),
        rot=rot,
        trans=vals.get("trans"),
    )
    sf = ShadeFields(
        mtype=gi[..., 4],
        ttype=gi[..., 5],
        image_id=gi[..., 6],
        fuzz=vals.get("fuzz"),
        ior=vals.get("ior"),
        albedo=vals.get("albedo"),
        color1=vals["color1"],
        color2=vals.get("color2"),
        scale=vals.get("scale"),
    )
    return pf, gi[..., 2], sf


def _dot(a, b):
    return (a * b).sum(-1)


def _xform_ray(pf: PrimFields, o, d, xp):
    """World ray -> object space: o' = R^T (o - t), d' = R^T d.

    Equivalent to translation.rs:24-30 + rotation.rs:102-116 composed.
    R is orthogonal so |d'| = |d| and the hit parameter t is unchanged.
    """
    om = o - pf.trans
    # R^T x  ==  einsum('...ji,...j->...i'); written with broadcasting so it
    # works for both NumPy and jax.numpy without einsum-string dispatch.
    o_obj = (pf.rot * om[..., :, None]).sum(-2)
    d_obj = (pf.rot * d[..., :, None]).sum(-2)
    return o_obj, d_obj


def _sphere_center(pf: PrimFields, time, has_motion: bool, xp):
    """moving_sphere.rs:53-57; static spheres have p1 == p0."""
    if not has_motion:
        return pf.p0
    frac = (time - pf.time0) / (pf.time1 - pf.time0)
    return pf.p0 + frac[..., None] * (pf.p1 - pf.p0)


def _sphere_roots(center, radius, o, d, xp):
    """Both quadratic roots (near, far) and existence mask.

    NaN-safe for autodiff: sqrt sees a positive argument on miss lanes
    (sqrt'(0) = inf would otherwise turn masked-out cotangents into NaN via
    the 0 * inf rule).
    """
    oc = o - center
    a = _dot(d, d)
    half_b = _dot(oc, d)
    c = _dot(oc, oc) - radius * radius
    disc = half_b * half_b - a * c
    exists = disc >= 0.0
    sq = sqrt_capped_grad(xp.where(exists, xp.maximum(disc, 1e-30), 1.0), xp)
    t_near = (-half_b - sq) / a
    t_far = (-half_b + sq) / a
    return t_near, t_far, exists


def sphere_t(pf: PrimFields, o, d, time, t_min, t_max, has_motion, xp):
    """Nearer-root-first sphere hit (sphere.rs:40-58), BIG on miss."""
    center = _sphere_center(pf, time, has_motion, xp)
    t_near, t_far, exists = _sphere_roots(center, pf.radius, o, d, xp)
    ok1 = exists & (t_near >= t_min) & (t_near <= t_max)
    ok2 = exists & (t_far >= t_min) & (t_far <= t_max)
    return xp.where(ok1, t_near, xp.where(ok2, t_far, BIG))


def _rect_components(axis, vec, xp):
    """Select (v[k_axis], v[a_axis], v[b_axis]) by plane tag (rect.rs:54-58)."""
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    # PLANE_XY=0 -> (z, x, y); PLANE_YZ=1 -> (x, y, z); PLANE_ZX=2 -> (y, z, x)
    vk = xp.where(axis == 0, z, xp.where(axis == 1, x, y))
    va = xp.where(axis == 0, x, xp.where(axis == 1, y, z))
    vb = xp.where(axis == 0, y, xp.where(axis == 1, z, x))
    return vk, va, vb


def rect_t(pf: PrimFields, o, d, t_min, t_max, xp, axis=None):
    """Axis-aligned rect hit in object space (rect.rs:53-86), BIG on miss.

    ``axis``: static plane tag when the whole primitive tile shares one
    (axis-pure tiles skip the per-prim component selects entirely)."""
    if axis is None:
        ok_, oa, ob = _rect_components(pf.axis, o, xp)
        dk, da, db = _rect_components(pf.axis, d, xp)
    else:
        ki, ai, bi = PLANE_AXES[int(axis)]  # rect.rs:54-58
        ok_, oa, ob = o[..., ki], o[..., ai], o[..., bi]
        dk, da, db = d[..., ki], d[..., ai], d[..., bi]
    a0, b0, k = pf.p0[..., 0], pf.p0[..., 1], pf.p0[..., 2]
    a1, b1 = pf.p1[..., 0], pf.p1[..., 1]
    # Safe division: a zero dk is masked out explicitly (the reference
    # rejects it via an inf t); dividing by the raw 0 would inject NaN into
    # gradients of masked lanes (0 * inf).
    parallel = dk == 0.0
    t = (k - ok_) / xp.where(parallel, 1.0, dk)
    a = oa + t * da
    b = ob + t * db
    ok = (
        ~parallel
        & (t >= t_min) & (t <= t_max)
        & (a >= a0) & (a <= a1) & (b >= b0) & (b <= b1)
    )
    return xp.where(ok, t, BIG)


def _box_slab(p0, p1, o, d, xp):
    """Per-axis slab interval of a solid box: (t_entry, t_exit).

    Same tiny-magnitude floor convention as medium_box_t: axis-parallel
    rays stay finite with the identical slab outcome, and masked-lane
    gradients never meet an inf primal.
    """
    d_safe = xp.where(xp.abs(d) < 1e-20, 1e-20, d)
    inv = 1.0 / d_safe
    t_lo = (p0 - o) * inv
    t_hi = (p1 - o) * inv
    t_entry = xp.minimum(t_lo, t_hi).max(-1)
    t_exit = xp.maximum(t_lo, t_hi).min(-1)
    return t_entry, t_exit


def box_t(pf: PrimFields, o, d, t_min, t_max, xp):
    """Solid axis-aligned box hit in object space, BIG on miss.

    Equivalence to the reference (cuboid.rs:31-88 decomposed to 6 rects,
    scanned by list.rs:20-31): a convex box's valid face hits are exactly
    the slab-interval endpoints t_entry < t_exit, so the closest face-rect
    hit inside [t_min, t_max] is t_entry when in range (ray origin
    outside), else t_exit when in range (origin inside), else a miss —
    the same near-root-first selection shape as sphere.rs:40-58.
    tests/test_box.py checks this against a literal 6-rect build on rays
    from inside, outside, and axis-parallel directions.
    """
    t_entry, t_exit = _box_slab(pf.p0, pf.p1, o, d, xp)
    exists = t_exit > t_entry
    ok1 = exists & (t_entry >= t_min) & (t_entry <= t_max)
    ok2 = exists & (t_exit >= t_min) & (t_exit <= t_max)
    return xp.where(ok1, t_entry, xp.where(ok2, t_exit, BIG))


def _medium_scatter_t(t_entry, t_exit, pf, d, t_min, t_max, med_u, xp):
    """Exponential free-flight sampling inside [entry, exit]
    (constant_medium.rs:40-76)."""
    exists = t_exit >= t_entry + MEDIUM_REHIT_EPS
    t1 = xp.maximum(t_entry, t_min)
    t2 = xp.minimum(t_exit, t_max)
    exists = exists & (t1 < t2)
    t1 = xp.maximum(t1, 0.0)
    ray_len = xp.sqrt(_dot(d, d))
    dist_inside = (t2 - t1) * ray_len
    # ln(U): U in [0,1) -> ln <= 0; nid < 0 -> hit_dist >= 0.  U == 0 gives
    # +inf -> guaranteed miss, matching the reference's ln(0) behaviour.
    hit_dist = pf.neg_inv_density * xp.log(med_u)
    exists = exists & (hit_dist <= dist_inside)
    t = t1 + hit_dist / ray_len
    return xp.where(exists, t, BIG)


def medium_sphere_t(pf: PrimFields, o, d, t_min, t_max, med_u, xp):
    t_near, t_far, exists = _sphere_roots(pf.p0, pf.radius, o, d, xp)
    t = _medium_scatter_t(t_near, t_far, pf, d, t_min, t_max, med_u, xp)
    return xp.where(exists, t, BIG)


def medium_box_t(pf: PrimFields, o, d, t_min, t_max, med_u, xp):
    """Slab entry/exit == the reference's two closest-rect hits through a
    cuboid boundary (cuboid.rs via list.rs linear scan)."""
    # Tiny-magnitude floor keeps axis-parallel rays finite (same slab
    # outcome) without inf primals that would NaN masked-lane gradients.
    d_safe = xp.where(xp.abs(d) < 1e-20, 1e-20, d)
    inv = 1.0 / d_safe
    t_lo = (pf.p0 - o) * inv
    t_hi = (pf.p1 - o) * inv
    t_entry = xp.minimum(t_lo, t_hi).max(-1)
    t_exit = xp.maximum(t_lo, t_hi).min(-1)
    exists = t_exit > t_entry
    t = _medium_scatter_t(t_entry, t_exit, pf, d, t_min, t_max, med_u, xp)
    return xp.where(exists, t, BIG)


def make_prim_intersector(static, *, types=None, has_motion=None,
                          has_xform=None, rect_axis=None,
                          assume_pure=False):
    """Returns hit_t(pf, o, d, time, t_min, t_max, ray_bits, xp) -> t.

    ``ray_bits``: per-ray uint32 (per pixel/sample/bounce) from which the
    media free-flight uniform is derived, salted with ``pf.stable_id`` so the
    draw is independent of primitive storage order (oracle == scan == BVH).

    The keyword overrides narrow the emitted math below the scene-level
    specialisation flags — the tiled sweep passes the set of types / motion /
    transform actually present in each primitive tile, so e.g. a rect-only
    tile pays ~30 flops per (ray, prim) pair instead of the ~110 of the full
    masked all-compute path.  ``types`` is an iterable of PT_* tags; ``None``
    means "all scene types".
    """
    if has_motion is None:
        has_motion = static.has_motion
    if has_xform is None:
        has_xform = static.has_ray_xform
    if types is None:
        types = {PT_SPHERE, PT_RECT}
        if static.has_media:
            types |= {PT_MEDIUM_SPHERE, PT_MEDIUM_BOX}
        if static.has_boxes:
            types |= {PT_BOX}
    types = frozenset(types)
    has_media = bool(types & {PT_MEDIUM_SPHERE, PT_MEDIUM_BOX})
    # assume_pure: the caller guarantees every lane is of the single type
    # (run-exact tile widths, no padding), so the tag mask is redundant.
    pure = assume_pure and len(types) == 1

    def hit_t(pf: PrimFields, o, d, time, t_min, t_max, ray_bits, xp):
        if has_xform:
            o_obj, d_obj = _xform_ray(pf, o, d, xp)
        else:
            o_obj, d_obj = o, d

        t = BIG
        if PT_SPHERE in types:
            ts = sphere_t(pf, o_obj, d_obj, time, t_min, t_max, has_motion,
                          xp)
            t = ts if pure else xp.where(pf.ptype == PT_SPHERE, ts, t)
        if PT_RECT in types:
            tr = rect_t(pf, o_obj, d_obj, t_min, t_max, xp,
                        axis=rect_axis)
            t = tr if pure else xp.where(pf.ptype == PT_RECT, tr, t)
        if PT_BOX in types:
            tb = box_t(pf, o_obj, d_obj, t_min, t_max, xp)
            t = tb if pure else xp.where(pf.ptype == PT_BOX, tb, t)
        if has_media:
            med_u = prng.bits_to_uniform(
                prng.stream_bits(ray_bits, prng.P_MEDIUM,
                                 pf.stable_id.astype(np.uint32))
            )
            if PT_MEDIUM_SPHERE in types:
                tm_ = medium_sphere_t(pf, o_obj, d_obj, t_min, t_max,
                                      med_u, xp)
                t = tm_ if pure else xp.where(
                    pf.ptype == PT_MEDIUM_SPHERE, tm_, t)
            if PT_MEDIUM_BOX in types:
                tb_ = medium_box_t(pf, o_obj, d_obj, t_min, t_max, med_u,
                                   xp)
                t = tb_ if pure else xp.where(
                    pf.ptype == PT_MEDIUM_BOX, tb_, t)
        if not types:
            t = xp.broadcast_to(
                xp.asarray(BIG), xp.broadcast_shapes(
                    pf.ptype.shape, o[..., 0].shape))
        return t

    return hit_t


class HitDetail(NamedTuple):
    point: np.ndarray  # [B,3]
    normal: np.ndarray  # [B,3] oriented against the ray (hit_record.rs:22-29)
    front_face: np.ndarray  # [B] bool
    u: np.ndarray  # [B]
    v: np.ndarray  # [B]


def _sphere_uv(outward, xp):
    """sphere.rs:31-36: theta = acos(-y), phi = atan2(-z, x) + pi.

    Clipped a hair inside [-1, 1] (and atan2 nudged off (0,0)) so pole hits
    have finite uv gradients; the primal shift is < 2e-4 in v exactly at the
    poles (oracle.py applies the identical clip).
    """
    theta = xp.arccos(xp.clip(-outward[..., 1], -(1.0 - 1e-7), 1.0 - 1e-7))
    x = outward[..., 0]
    z = outward[..., 2]
    x = xp.where((x == 0.0) & (z == 0.0), 1e-20, x)
    phi = xp.arctan2(-z, x) + np.float32(np.pi)
    return phi * np.float32(0.5 / np.pi), theta * np.float32(1.0 / np.pi)


def make_hit_detailer(static):
    """Returns detail(pf, o, d, time, t) -> HitDetail for winning prims."""
    has_motion = static.has_motion
    has_xform = static.has_ray_xform
    has_boxes = static.has_boxes

    def detail(pf: PrimFields, o, d, time, t, xp) -> HitDetail:
        point = o + t[..., None] * d
        if has_xform:
            o_obj, d_obj = _xform_ray(pf, o, d, xp)
        else:
            o_obj, d_obj = o, d
        point_obj = o_obj + t[..., None] * d_obj

        is_sphere = pf.ptype == PT_SPHERE
        is_rect = pf.ptype == PT_RECT

        # Sphere branch (world frame: sphere transforms are baked).
        center = _sphere_center(pf, time, has_motion, xp)
        safe_r = xp.where(pf.radius == 0.0, 1.0, pf.radius)
        outward_s = (point - center) / safe_r[..., None]
        su, sv = _sphere_uv(outward_s, xp)

        # Rect branch (object frame).
        _, oa, ob = _rect_components(pf.axis, o_obj, xp)
        _, da, db = _rect_components(pf.axis, d_obj, xp)
        a0, b0 = pf.p0[..., 0], pf.p0[..., 1]
        a1, b1 = pf.p1[..., 0], pf.p1[..., 1]
        a = oa + t * da
        b = ob + t * db
        # Safe denominators: non-rect lanes have a1 == a0 (0/0 would NaN
        # sphere-lane gradients through the masked select).
        da_span = xp.where(a1 > a0, a1 - a0, 1.0)
        db_span = xp.where(b1 > b0, b1 - b0, 1.0)
        ru = (a - a0) / da_span
        rv = (b - b0) / db_span
        # Outward normal: +1 on the k axis (rect.rs:81-83).
        kx = (pf.axis == 1).astype(np.float32)
        ky = (pf.axis == 2).astype(np.float32)
        kz = (pf.axis == 0).astype(np.float32)
        outward_r_obj = xp.stack([kx, ky, kz], axis=-1)
        if has_xform:
            outward_r = (pf.rot * outward_r_obj[..., None, :]).sum(-1)
        else:
            outward_r = outward_r_obj

        outward = xp.where(is_sphere[..., None], outward_s,
                           xp.where(is_rect[..., None], outward_r, 0.0))
        u = xp.where(is_sphere, su, xp.where(is_rect, ru, 0.0))
        v = xp.where(is_sphere, sv, xp.where(is_rect, rv, 0.0))

        if has_boxes:
            # Box branch (object frame): recover WHICH face the winning t
            # lies on by recomputing the six slab endpoint t's with the
            # exact arithmetic of box_t — the winner matches one bitwise,
            # so argmin |t_face - t| is exact, not a tolerance test.
            is_box = pf.ptype == PT_BOX
            d_safe = xp.where(xp.abs(d_obj) < 1e-20, 1e-20, d_obj)
            inv = 1.0 / d_safe
            t_lo = (pf.p0 - o_obj) * inv
            t_hi = (pf.p1 - o_obj) * inv
            tl = xp.minimum(t_lo, t_hi)
            th = xp.maximum(t_lo, t_hi)
            cand = xp.concatenate([tl, th], axis=-1)  # [B,6]
            face_ax = xp.argmin(
                xp.abs(cand - t[..., None]), axis=-1) % 3  # [B] in {x,y,z}
            # Outward normal = +1 on the face axis (rect.rs:81-83 — the
            # reference's cuboid faces at BOTH k=min and k=max carry the
            # +e_k outward; set_face_normal below orients it, and
            # front_face inherits the same two-sided-rect convention).
            outward_b_obj = xp.stack(
                [(face_ax == 0).astype(np.float32),
                 (face_ax == 1).astype(np.float32),
                 (face_ax == 2).astype(np.float32)], axis=-1)
            if has_xform:
                outward_b = (pf.rot * outward_b_obj[..., None, :]).sum(-1)
            else:
                outward_b = outward_b_obj
            # Face uv: the cuboid.rs face list parameterises
            #   z-faces as (a,b) = (x,y)   [PLANE_XY]
            #   y-faces as (a,b) = (z,x)   [PLANE_ZX]
            #   x-faces as (a,b) = (y,z)   [PLANE_YZ]
            span = pf.p1 - pf.p0
            span = xp.where(span > 0.0, span, 1.0)  # pad/degenerate lanes
            rel = (point_obj - pf.p0) / span
            rx, ry, rz = rel[..., 0], rel[..., 1], rel[..., 2]
            bu = xp.where(face_ax == 0, ry, xp.where(face_ax == 1, rz, rx))
            bv = xp.where(face_ax == 0, rz, xp.where(face_ax == 1, rx, ry))
            outward = xp.where(is_box[..., None], outward_b, outward)
            u = xp.where(is_box, bu, u)
            v = xp.where(is_box, bv, v)

        # set_face_normal (hit_record.rs:22-29). Media keep a zero normal and
        # front_face false (constant_medium.rs:67-75).
        front = _dot(d, outward) < 0.0
        normal = xp.where(front[..., None], outward, -outward)
        return HitDetail(point=point, normal=normal, front_face=front,
                         u=u, v=v)

    return detail


def aabb_hit(box_min, box_max, o, inv_d, t_min, t_max, xp):
    """Slab test (aabb.rs:20-47): strict overlap, ``t_max <= t_min`` misses."""
    t0 = (box_min - o) * inv_d
    t1 = (box_max - o) * inv_d
    lo = xp.minimum(t0, t1)
    hi = xp.maximum(t0, t1)
    tmin_all = xp.maximum(lo.max(-1), t_min)
    tmax_all = xp.minimum(hi.min(-1), t_max)
    return tmax_all > tmin_all
