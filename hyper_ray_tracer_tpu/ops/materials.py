"""Masked branch-free material shading.

Replaces the reference's ``Material::scatter/emitted`` dynamic dispatch
(`/root/reference/src/materials/`) with all-compute over the material SoA,
pruned at trace time by ``SceneStatic.mat_types`` (a scene without
dielectrics pays nothing for refraction math, etc.).

Random draws come from named counter-based streams (ops/rng.py) derived from
the per-(pixel, sample, bounce) base hash, so the scalar oracle and the
vectorised renderer consume identical samples regardless of which masked
lanes are live.

Semantics:
  lambertian   lambertian.rs:27-38  (normal + unit vector, near-zero fallback)
  metal        metal.rs:29-42       (fuzzy reflect, absorb when scattered
                                     leaves the surface)
  dielectric   dielectric.rs:31-55  (front_face ratio, TIR, Schlick vs U)
  diffuse_light diffuse_light.rs:21-27 (no scatter; emits texture value)
  isotropic    isotropic.rs:27-33   (uniform-in-ball direction)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..models.scene import (
    MT_DIELECTRIC,
    MT_DIFFUSE_LIGHT,
    MT_ISOTROPIC,
    MT_LAMBERTIAN,
    MT_METAL,
)
from . import math as m
from . import rng as prng
from .textures import texture_value


class ScatterResult(NamedTuple):
    emitted: np.ndarray  # [B,3]
    attenuation: np.ndarray  # [B,3]
    direction: np.ndarray  # [B,3] (unnormalised, like the reference)
    did_scatter: np.ndarray  # [B] bool


def shade(arrays, mat_idx, hit, d, bb, static, xp, sf=None) -> ScatterResult:
    """Shade one wavefront bounce.

    arrays: SceneArrays;  mat_idx: [B] int32 winning material ids;
    hit: HitDetail;  d: [B,3] incoming ray directions;
    bb: [B] uint32 per-(pixel,sample,bounce) RNG base hashes.
    When ``sf`` (intersect.ShadeFields) is given, material and texture
    rows come from the winner's joined row gather and no table gathers
    run here (the hot path — see intersect.pack_prim_shade).
    """
    if sf is not None:
        mtype = sf.mtype
        tex_idx = None
        fuzz = sf.fuzz
        ior_all = sf.ior
        albedo = sf.albedo
    else:
        mats = arrays.materials
        # Packed row gathers (intersect.pack_prim): 2 gathers instead of 7.
        mi = xp.stack([mats.mtype, mats.texture], axis=-1)[mat_idx]
        mf = xp.concatenate(
            [mats.fuzz[:, None], mats.ior[:, None], mats.albedo], axis=-1
        )[mat_idx]
        mtype = mi[..., 0]
        tex_idx = mi[..., 1]
        fuzz = mf[..., 0]
        ior_all = mf[..., 1]
        albedo = mf[..., 2:5]

    tex_color = texture_value(
        arrays.textures, arrays.images, arrays.image_wh, arrays.perlin,
        tex_idx, hit.u, hit.v, hit.point, static, xp, sf=sf,
    )

    B = mtype.shape if hasattr(mtype, "shape") else ()
    zero3 = xp.zeros((*B, 3), np.float32)
    emitted = zero3
    attenuation = zero3
    direction = zero3
    did_scatter = xp.zeros(B, bool)

    present = set(static.mat_types)
    normal = hit.normal

    if MT_LAMBERTIAN in present:
        u1 = prng.uniform(bb, prng.P_LAMBERT_A)
        u2 = prng.uniform(bb, prng.P_LAMBERT_B)
        sdir = normal + m.unit_vector_from_uniforms(u1, u2, xp)
        sdir = xp.where(m.near_zero(sdir, xp), normal, sdir)
        sel = (mtype == MT_LAMBERTIAN)[..., None]
        direction = xp.where(sel, sdir, direction)
        attenuation = xp.where(sel, tex_color, attenuation)
        did_scatter = did_scatter | (mtype == MT_LAMBERTIAN)

    if MT_METAL in present or MT_ISOTROPIC in present:
        # Both draw from the shared in-unit-sphere stream (a material is
        # never both, so the streams cannot collide on one ray).
        s1 = prng.uniform(bb, prng.P_SPHERE_A)
        s2 = prng.uniform(bb, prng.P_SPHERE_B)
        s3 = prng.uniform(bb, prng.P_SPHERE_C)
        in_sphere = m.in_unit_sphere_from_uniforms(s1, s2, s3, xp)

    if MT_METAL in present:
        reflected = m.reflect(m.normalize(d, xp), normal)
        sdir = reflected + fuzz[..., None] * in_sphere
        ok = (sdir * normal).sum(-1) > 0.0  # metal.rs:37-41 absorption
        sel_m = mtype == MT_METAL
        sel = sel_m[..., None]
        direction = xp.where(sel, sdir, direction)
        attenuation = xp.where(sel, albedo, attenuation)
        did_scatter = xp.where(sel_m, ok, did_scatter)

    if MT_DIELECTRIC in present:
        ior = ior_all
        ratio = xp.where(hit.front_face, 1.0 / ior, ior)
        unit_d = m.normalize(d, xp)
        cos_theta = xp.minimum((-unit_d * normal).sum(-1), 1.0)
        # Compare sin^2 to avoid sqrt(0) at normal incidence (NaN-safe VJP);
        # ratio >= 0 so the squared comparison is equivalent.
        sin2 = xp.maximum(0.0, 1.0 - cos_theta * cos_theta)
        cannot_refract = (ratio * ratio * sin2) > 1.0
        u = prng.uniform(bb, prng.P_DIELECTRIC)
        use_reflect = cannot_refract | (m.reflectance(cos_theta, ratio) > u)
        refl = m.reflect(unit_d, normal)
        refr = m.refract(unit_d, normal, ratio[..., None], xp)
        sdir = xp.where(use_reflect[..., None], refl, refr)
        sel_m = mtype == MT_DIELECTRIC
        sel = sel_m[..., None]
        direction = xp.where(sel, sdir, direction)
        attenuation = xp.where(sel, xp.ones_like(tex_color), attenuation)
        did_scatter = did_scatter | sel_m

    if MT_DIFFUSE_LIGHT in present:
        sel_m = mtype == MT_DIFFUSE_LIGHT
        emitted = xp.where(sel_m[..., None], tex_color, emitted)
        did_scatter = did_scatter & ~sel_m

    if MT_ISOTROPIC in present:
        sel_m = mtype == MT_ISOTROPIC
        sel = sel_m[..., None]
        direction = xp.where(sel, in_sphere, direction)
        attenuation = xp.where(sel, tex_color, attenuation)
        did_scatter = did_scatter | sel_m

    return ScatterResult(emitted=emitted, attenuation=attenuation,
                         direction=direction, did_scatter=did_scatter)
