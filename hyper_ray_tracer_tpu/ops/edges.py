"""Edge-sampled silhouette gradients for scene geometry.

The wavefront renderer's gradient convention is *fixed-decision*
(train.py:9-16): hit/miss booleans are decided in the primal and gradients
flow only through continuous quantities.  That makes the gradient of an
occlusion boundary — moving a sphere so its silhouette sweeps across
pixels — exactly zero, even though the EXPECTED pixel value (the integral
of radiance over the pixel footprint under jittered sampling,
application.rs:443-446) is a smooth function of the sphere parameters.

This module restores the missing boundary term with the classic
edge-sampling estimator (differentiable-rendering literature; PAPERS.md):
for each sphere the silhouette is a known smooth curve, so

    d E[pixel] / dtheta  =  interior term (autodiff)
        +  (1/A_pixel) * INT_{silhouette in pixel} dL * (v . n) dl

where dL is the radiance difference across the edge, v = dx_edge/dtheta is
the image-space edge velocity, and n the image-space edge normal.  The
integral is estimated by sampling the silhouette circle: the cone of
directions from the camera origin tangent to sphere (c, r) has half-angle
asin(r/L) about (c - o)/L, a closed form the sampler differentiates
through.

The estimator is wired in as a STRAIGHT-THROUGH image correction: the
returned [W*H, 3] image is exactly zero in the primal (x - stop_grad(x)),
and its tangent w.r.t. (geom.p0, geom.p1, geom.radius) is the boundary
term — so
`image + correction` gives any downstream loss the full gradient by the
chain rule, with no custom VJP.

Occlusion needs no special casing: the inside/outside probe rays of an
occluded edge point both hit the occluder, so dL ~ 0 and the sample
cancels itself.

Covered geometry: static spheres (silhouette = tangent-cone circle),
rects (silhouette = the 4 boundary segments — a flat patch's visibility
discontinuity is its outline from every viewpoint, rect.rs:53-86
geometry) and solid boxes (12 candidate segments, silhouette-tested per
edge: kept iff its two adjacent faces straddle front/back-facing,
cuboid.rs:31-88 geometry; baked rigid transforms applied).  Segment
edges are differentiable w.r.t. the rect/box parameters in geom.p0/p1 —
an object-space shift is a world-space shift through the baked rotation,
so box/rect POSITION gradients flow (tests/test_edges.py).

Moving spheres are covered by TIME-SAMPLED edges: each silhouette sample
draws a shutter time from a stratified lattice, places the circle at the
lerped center c(t) (moving_sphere.rs semantics) and probes radiance at
that same time, so the estimator integrates the boundary term over the
shutter and both center endpoints receive gradients.

Defocus (camera.rs:85-94 thin lens) is handled the same way: each edge
sample also draws a lens-disk point; the silhouette is computed FROM that
lens point (tangent cone apex / segment viewpoint), projected along the
lens ray onto the focal plane, and probed from the same lens point — so
the estimator integrates the boundary term over the aperture.  With
aperture 0 the offsets vanish and the pinhole form is recovered exactly.

One-specular-bounce silhouettes (PLANAR mirrors): silhouettes seen in a
flat polished mirror (a PT_RECT whose material is metal with fuzz == 0)
get their boundary term through virtual images — reflecting a sphere
center / segment endpoints across the mirror plane produces the exact
geometry of the mirrored silhouette for EVERY viewpoint (a planar
mirror's virtual image is viewpoint-independent, so the construction
composes exactly with the time- and lens-sampled machinery).  Validity
is self-gating, like occlusion: where the primary ray does not actually
hit the mirror, both side probes see the same radiance and the sample
cancels (dL ~ 0).  The mirror's own plane offset is differentiable too
(the virtual image moves at twice the mirror's speed, as it must).
tests/test_edges.py::test_mirror_* check FD parity and the
self-exclusion rule (a mirror is not reflected in itself).

CURVED mirrors (sphere mirrors — e.g. the random scene's polished-metal
hero sphere, application.rs:560-563): a curved mirror has no
viewpoint-independent virtual image, so each (mirror, source-sphere)
pair instead gets its silhouette curve SOLVED on the mirror surface
(``_curved_mirror_xy``): an unrolled-Newton Alhazen solve finds the
chief reflection point (the mirrored image of the source center), and a
second unrolled Newton along surface geodesics finds, per curve
parameter, the point whose reflected ray is exactly tangent to the
source.  Both solves are plain smooth jnp math, so jax differentiates
the curve w.r.t. source center/radius AND mirror center/radius through
the iterations (implicit-function-exact at convergence); samples that
fail to converge (source occluded / outside the mirror's view) are
masked and, as always, the probes self-gate partial occlusion via
dL ~ 0.  Round 2 measured this term as 100% of the position derivative
on a close-up rig (grad 0 vs FD -1.5e-3); the solver now restores it to
FD accuracy (tests/test_edges.py::test_curved_mirror_silhouette_grad_
matches_fd: grad -1.26e-3 vs FD -1.54e-3 on the same rig).

Rect/box sources in curved mirrors need no tangency solve at all: a
boundary segment is a point set, and a point's mirrored image is just
the Alhazen chief point — so each sample is one chief solve
(``_curved_mirror_point_xy``), with box silhouette-edge tests evaluated
from the per-sample reflection point (the viewpoint the real geometry
is seen from).  Pairs are capped by apparent segment size
(``mirror_pairs_max`` per mirror).

REFRACTED silhouettes (glass spheres — the hero sphere
application.rs:551, dielectric.rs:31-55): sources seen THROUGH a
positive-radius dielectric sphere get their boundary term from the
doubly-refracted analogue of the curved-mirror machinery: the chief
solve (``_glass_chief``) finds the refracted image of the source center
by grid-seeded unrolled Newton on the in-plane entry angle (a ball lens
INVERTS — the chief usually sits on the opposite side of the axis, so
no reflection-style geometric seed exists), the exit ray is closed-form
(``_glass_exit_ray``: entry refraction, chord, exit refraction with TIR
masking), and sphere sources add the same tangency Newton along the
entry-surface geodesic (``_glass_sphere_xy``); rect/box sources need
chief solves only (``_glass_point_xy``).  The IOR is a traced input, so
d(image)/d(ior) carries the boundary term too.  Measured on the
glass-rig (tests/test_edges.py::test_glass_silhouette_grad_matches_fd):
without the family the gradient of a source visible only through the
glass ball is EXACTLY ZERO against a finite FD (the round-3 verdict's
unquantified gap was 100% of the derivative); with it the gradient
lands within ~10% of FD on the isolated window (~82% over the whole
disk — the remainder is second-order paths, see scope).

Scope (documented limitations):
* Double reflections (mirror seen in mirror) are not reflected again.
* Glass: dielectric SPHERES, four path families — the T*T double
  refraction (solid balls), the EXTERNAL Fresnel mirror image (the
  glass surface reflects ~4-10% Schlick, dielectric.rs:47-50; glass
  spheres — solid or shell — join the curved-mirror bender set, the
  probes self-gate the magnitude), the first internal
  Fresnel-reflection image (T*R*T, ``_glass_trt_exit_ray`` — same
  chief+tangency solve on a different optical path), and the
  HOLLOW-SHELL through image (round 5: concentric positive+negative
  radius pairs get the 4-interface ``_glass_shell_exit_ray`` instead
  of the solid-ball optics; sphere sources only — measured on the
  hollow rig in tests/test_edges.py).  Not covered: rect/box sources
  through shells, rays confined to a shell's glass annulus (bubble
  misses are masked), T*R^k*T for k >= 2, and glass-behind-glass
  chains.  The reference never builds a hollow shell (no negative
  radius anywhere in application.rs) — shells are BASELINE config-2
  geometry.
* Media boundaries have no radiance discontinuity (smooth free-flight
  attenuation), so constant-medium primitives need no edge term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import PT_BOX, PT_RECT, PT_SPHERE
from ..render import deprecate_use_bvh
from . import rng as prng
from .math import sqrt_capped_grad

_TWO_PI = np.float32(2.0 * np.pi)


def static_sphere_ids(scene) -> np.ndarray:
    """Host-side: indices of static (non-moving) spheres."""
    g = scene.arrays.geom
    pt = np.asarray(g.ptype)[: scene.static.n_prims]
    p0 = np.asarray(g.p0)[: scene.static.n_prims]
    p1 = np.asarray(g.p1)[: scene.static.n_prims]
    ok = (pt == PT_SPHERE) & np.all(p0 == p1, axis=-1)
    return np.flatnonzero(ok).astype(np.int32)


def sphere_ids_of(scene) -> np.ndarray:
    """Host-side: indices of ALL spheres, static and moving.  Moving
    spheres get time-sampled edge terms (each silhouette sample carries a
    shutter time; the center lerp moves the circle, moving_sphere.rs
    semantics) so motion-blurred silhouettes are differentiable too."""
    pt = np.asarray(scene.arrays.geom.ptype)[: scene.static.n_prims]
    return np.flatnonzero(pt == PT_SPHERE).astype(np.int32)


def rect_ids_of(scene) -> np.ndarray:
    """Host-side: indices of rect primitives (always silhouette-edged)."""
    pt = np.asarray(scene.arrays.geom.ptype)[: scene.static.n_prims]
    return np.flatnonzero(pt == PT_RECT).astype(np.int32)


def box_ids_of(scene) -> np.ndarray:
    """Host-side: indices of solid-box primitives."""
    pt = np.asarray(scene.arrays.geom.ptype)[: scene.static.n_prims]
    return np.flatnonzero(pt == PT_BOX).astype(np.int32)


def mirror_rect_ids_of(scene) -> np.ndarray:
    """Host-side: rect primitives that act as PLANAR MIRRORS — material
    metal with fuzz == 0 (metal.rs:30-35 with no perturbation reflects
    deterministically, so a virtual-image silhouette is exact)."""
    from ..models.scene import MT_METAL

    g = scene.arrays.geom
    n = scene.static.n_prims
    pt = np.asarray(g.ptype)[:n]
    mat = np.asarray(g.material)[:n]
    mt = np.asarray(scene.arrays.materials.mtype)[mat]
    fz = np.asarray(scene.arrays.materials.fuzz)[mat]
    ok = (pt == PT_RECT) & (mt == MT_METAL) & (fz == 0.0)
    return np.flatnonzero(ok).astype(np.int32)


def _mirror_planes(geom, mirror_ids):
    """Differentiable world planes of mirror rects: (point [M,3],
    unit normal [M,3]).  The normal is the baked rotation's column for
    the rect's k axis (rect.rs:81-83 outward +e_k; static direction),
    the point is corner 0 (moves with the trainable k offset in p0)."""
    corners = _rect_corners(geom, mirror_ids)  # [M,4,3]
    axis = geom.axis[mirror_ids]
    # k axis in world: axis 0 (XY) -> z, 1 (YZ) -> x, 2 (ZX) -> y.
    kx = (axis == 1).astype(jnp.float32)
    ky = (axis == 2).astype(jnp.float32)
    kz = (axis == 0).astype(jnp.float32)
    n_obj = jnp.stack([kx, ky, kz], -1)  # [M,3]
    n = jnp.einsum("rij,rj->ri", geom.rot[mirror_ids], n_obj)
    return corners[:, 0], n


def _reflect_pts(x, pnt, nrm):
    """Householder reflection of points ``x`` [..., 3] across the plane
    (pnt, nrm); affine, so lerped centers stay lerps of reflections."""
    d = ((x - pnt) * nrm).sum(-1, keepdims=True)
    return x - 2.0 * d * nrm


def _reflect_dirs(v, nrm):
    return v - 2.0 * (v * nrm).sum(-1, keepdims=True) * nrm


def mirror_sphere_ids_of(scene) -> np.ndarray:
    """Host-side: STATIC spheres whose material is metal with fuzz == 0 —
    curved mirrors (e.g. the random scene's polished hero sphere,
    application.rs:560-563)."""
    from ..models.scene import MT_METAL

    g = scene.arrays.geom
    n = scene.static.n_prims
    pt = np.asarray(g.ptype)[:n]
    st = np.all(np.asarray(g.p0)[:n] == np.asarray(g.p1)[:n], axis=-1)
    mat = np.asarray(g.material)[:n]
    mt = np.asarray(scene.arrays.materials.mtype)[mat]
    fz = np.asarray(scene.arrays.materials.fuzz)[mat]
    ok = (pt == PT_SPHERE) & st & (mt == MT_METAL) & (fz == 0.0)
    return np.flatnonzero(ok).astype(np.int32)


def _normize(v):
    # Plain sqrt with a floor (not sqrt_capped_grad, whose custom_vjp
    # blocks the forward-mode tangents the curve-parameter jacobians
    # use); callers keep arguments well away from 0.
    return v / jnp.sqrt(jnp.maximum((v * v).sum(-1, keepdims=True),
                                    1e-24))


def _alhazen_chief(E, m, R, c, n_alhazen: int = 4):
    """Reflection point of target ``c`` on sphere mirror (m, R) seen from
    eye ``E`` (the classical Alhazen problem): unrolled Newton on the
    in-plane reflection condition, seeded by the bisector heuristic
    (exact when |E-m| == |c-m|).  Returns (u0, a_e, b_e): the unit
    surface direction of the chief point and the in-plane frame."""
    a_e = _normize(E - m)  # axis toward the eye
    cm = c - m
    b_raw = cm - (cm * a_e).sum() * a_e
    # Degenerate on-axis case: any orthogonal works (the configuration
    # is rotationally symmetric; the frame only labels directions).
    b_len2 = (b_raw * b_raw).sum()
    alt = jnp.where(jnp.abs(a_e[1]) < 0.9,
                    jnp.array([0.0, 1.0, 0.0], jnp.float32),
                    jnp.array([1.0, 0.0, 0.0], jnp.float32))
    alt = _normize(jnp.cross(a_e, alt))
    b_e = jnp.where(b_len2 > 1e-12,
                    b_raw / jnp.sqrt(jnp.maximum(b_len2, 1e-20)), alt)

    def chief_residual(psi):
        u = jnp.cos(psi) * a_e + jnp.sin(psi) * b_e
        x = m + R * u
        to_e = _normize(E - x)
        to_c = _normize(c - x)
        # Reflection law: the normal u bisects to_e/to_c — their
        # tangential components cancel.
        h = to_e + to_c
        return (h * b_e).sum() * (u * a_e).sum() \
            - (h * a_e).sum() * (u * b_e).sum()

    bis = _normize(_normize(E - m) + _normize(c - m))
    psi = jnp.arctan2((bis * b_e).sum(), (bis * a_e).sum())
    psi = jax.lax.stop_gradient(psi)
    for _ in range(n_alhazen):
        g = chief_residual(psi)
        dg = jax.grad(chief_residual)(psi)
        psi = psi - g / jnp.where(jnp.abs(dg) > 1e-12, dg,
                                  jnp.where(dg >= 0, 1e-12, -1e-12))
    u0 = jnp.cos(psi) * a_e + jnp.sin(psi) * b_e
    return u0, a_e, b_e


def _dielectric_spheres(scene):
    """Host-side helper: (static_mask & dielectric sphere mask, radius,
    centers) over the first n_prims primitives."""
    from ..models.scene import MT_DIELECTRIC

    g = scene.arrays.geom
    n = scene.static.n_prims
    pt = np.asarray(g.ptype)[:n]
    st = np.all(np.asarray(g.p0)[:n] == np.asarray(g.p1)[:n], axis=-1)
    mat = np.asarray(g.material)[:n]
    mt = np.asarray(scene.arrays.materials.mtype)[mat]
    rad = np.asarray(g.radius)[:n]
    return ((pt == PT_SPHERE) & st & (mt == MT_DIELECTRIC),
            rad, np.asarray(g.p0)[:n])


def glass_shell_pairs_of(scene) -> np.ndarray:
    """Host-side: [K, 2] (outer, inner) ids of concentric hollow-glass
    shell pairs — a positive-radius dielectric sphere plus a
    NEGATIVE-radius dielectric sphere at (numerically) the same center
    with |r_inner| < r_outer (the book's hollow-glass trick: the
    negative radius flips set_face_normal so the inner surface's front
    faces the glass, dielectric.rs:31-55 + sphere.rs normals; the
    reference itself never builds one, BASELINE config 2 does)."""
    ok, rad, cen = _dielectric_spheres(scene)
    pos = np.flatnonzero(ok & (rad > 0.0))
    neg = np.flatnonzero(ok & (rad < 0.0))
    pairs = []
    for i in pos:
        tol = 1e-4 * abs(rad[i])
        for j in neg:
            if (np.linalg.norm(cen[j] - cen[i]) <= tol
                    and abs(rad[j]) < rad[i]):
                pairs.append((int(i), int(j)))
                break
    return np.asarray(pairs, np.int32).reshape(-1, 2)


def glass_sphere_ids_of(scene) -> np.ndarray:
    """Host-side: STATIC positive-radius dielectric spheres that are
    SOLID lenses (e.g. the glass hero sphere, application.rs:551,
    dielectric.rs:31-55).  Negative-radius shells (hollow-glass inners)
    are skipped, and so are their OUTERS (glass_shell_pairs_of): a
    hollow shell's through-path crosses four interfaces, so the
    solid-ball T*T / T*R*T optics is wrong for it — shells get the
    dedicated 4-interface family (``_glass_shell_exit_ray``) and keep
    the external-Fresnel-mirror family (outer-surface reflection is
    geometry-inside-agnostic)."""
    ok, rad, _ = _dielectric_spheres(scene)
    ids = np.flatnonzero(ok & (rad > 0.0)).astype(np.int32)
    shells = glass_shell_pairs_of(scene)
    if len(shells):
        ids = ids[~np.isin(ids, shells[:, 0])]
    return ids.astype(np.int32)


def _refract_unit(v, n, ratio):
    """Unit refraction of unit ``v`` at unit normal ``n`` (pointing
    against v, i.e. cos_i = -(v.n) > 0), Snell ratio = n_i/n_t
    (math.rs:51-56 form).  Returns (v_t, tir): past critical angle the
    sqrt is clamped and ``tir`` marks the sample invalid."""
    cos_i = -(v * n).sum()
    sin2_t = ratio * ratio * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    return ratio * v + (ratio * cos_i - cos_t) * n, tir


def _glass_exit_ray(E, m, R, ior, u):
    """Doubly-refracted exit ray of the camera ray E -> (m + R u) through
    the glass sphere (m, R, ior): returns (x1, x2, v3, tir).

    x1 = entry point, v1 refracts in (air->glass never TIRs), the chord
    to the exit point x2 is closed-form (|x1 - m| = R), and the exit
    refraction glass->air can TIR (``tir``).  All smooth jnp math, so
    both the curve parameters (forward mode) and the scene parameters
    m, R, ior, and the source fields (reverse mode) differentiate
    through it — the refractive analogue of the reflection step inside
    ``_curved_mirror_xy``."""
    x1 = m + R * u
    v1 = _normize(x1 - E)
    v2, _ = _refract_unit(v1, u, 1.0 / ior)  # entry: normal = +u
    v2 = _normize(v2)
    t2 = -2.0 * R * (v2 * u).sum()  # chord length (positive: v2.u < 0)
    x2 = x1 + t2 * v2
    n2 = (x2 - m) / R  # outward exit normal; v2.n2 > 0
    v3, tir = _refract_unit(v2, -n2, ior)
    return x1, x2, _normize(v3), tir


def _glass_trt_exit_ray(E, m, R, ior, u):
    """T*R*T exit ray: entry refraction, chord, INTERNAL Fresnel
    reflection at the far surface, second chord, exit refraction —
    the first internal-reflection image family (dielectric.rs:47-50
    samples the reflective branch with probability reflectance(), so
    these paths carry ~R(theta) of the transmitted radiance).  Same
    return convention as ``_glass_exit_ray``: (x1, x_exit, v_out, tir),
    all smooth jnp math."""
    x1 = m + R * u
    v1 = _normize(x1 - E)
    v2, _ = _refract_unit(v1, u, 1.0 / ior)  # entry: normal = +u
    v2 = _normize(v2)
    t2 = -2.0 * R * (v2 * u).sum()
    x2 = x1 + t2 * v2
    n2 = (x2 - m) / R  # outward normal at the far surface
    vr = v2 - 2.0 * (v2 * n2).sum() * n2  # internal mirror bounce
    t3 = -2.0 * R * (vr * n2).sum()  # chord back across the ball
    x3 = x2 + t3 * vr
    n3 = (x3 - m) / R
    v4, tir = _refract_unit(vr, -n3, ior)
    return x1, x3, _normize(v4), tir


def _glass_shell_exit_ray(E, m, R, ior, u, Ri):
    """Four-interface exit ray through a HOLLOW glass shell: outer
    radius R, concentric air bubble radius Ri (= |negative inner
    radius|), index ior (glass_shell_pairs_of; dielectric.rs:31-55 with
    the negative-radius normal flip).

    Path: air ->(outer, 1/ior)-> glass ->(bubble near side, ior)-> air
    ->(bubble far side, 1/ior)-> glass ->(outer far side, ior)-> air.
    Chords between concentric spheres are closed-form.  Entries that
    MISS the bubble (near-limb rays staying inside the glass annulus)
    are masked invalid — their thick-annulus optics is neither this
    family nor the solid ball's (module scope notes).  Either glass->
    air interface can TIR; same (x_entry, x_exit, v_out, invalid)
    convention as ``_glass_exit_ray``."""
    x1 = m + R * u
    v1 = _normize(x1 - E)
    v2, _ = _refract_unit(v1, u, 1.0 / ior)  # outer entry: never TIRs
    v2 = _normize(v2)
    hb = ((x1 - m) * v2).sum()  # negative: v2 heads inward
    disc = hb * hb - (R * R - Ri * Ri)
    miss = disc <= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 1e-20))
    xb1 = x1 + (-hb - sq) * v2  # first bubble crossing
    nb1 = (xb1 - m) / Ri  # outward bubble normal; v2.nb1 < 0
    v3, tir1 = _refract_unit(v2, nb1, ior)  # glass -> air
    v3 = _normize(v3)
    xb2 = xb1 + (-2.0 * Ri * (v3 * nb1).sum()) * v3  # bubble chord
    nb2 = (xb2 - m) / Ri  # v3.nb2 > 0
    v4, _ = _refract_unit(v3, -nb2, 1.0 / ior)  # air -> glass
    v4 = _normize(v4)
    hb2 = ((xb2 - m) * v4).sum()
    t_out = -hb2 + jnp.sqrt(
        jnp.maximum(hb2 * hb2 + R * R - Ri * Ri, 1e-20))
    x2 = xb2 + t_out * v4
    n2 = (x2 - m) / R
    v5, tir2 = _refract_unit(v4, -n2, ior)  # outer exit: glass -> air
    return x1, x2, _normize(v5), miss | tir1 | tir2


def _glass_chief(E, m, R, ior, c, n_newton: int = 8,
                 exit_fn=None):
    """Entry direction u0 of the CHIEF refracted path E -> glass sphere
    (m, R, ior) -> target ``c`` (the refracted image of c), plus the
    in-plane frame: the refractive analogue of ``_alhazen_chief``.

    By symmetry the chief path lies in the (E, m, c) plane; unrolled
    Newton runs on the in-plane entry angle psi with the signed
    misalignment of the exit ray against the exit->target direction as
    the residual.  Unlike the Alhazen (reflection) case there is no
    cheap geometric seed: a ball lens INVERTS, so the chief entry point
    usually sits on the OPPOSITE side of the axis from the target, and
    the residual is far from monotone — the seed is therefore a coarse
    sign-aware grid scan over psi in (-pi/2, pi/2) (stop-gradient; the
    Newton polish carries all the derivatives).

    ``exit_fn``: the through-the-ball ray map (default ``_glass_exit_
    ray``, the T*T double refraction; ``_glass_trt_exit_ray`` gives
    the internal-reflection T*R*T family - same solve, different
    optical path)."""
    if exit_fn is None:
        exit_fn = _glass_exit_ray
    a_e = _normize(E - m)
    cm = c - m
    b_raw = cm - (cm * a_e).sum() * a_e
    b_len2 = (b_raw * b_raw).sum()
    alt = jnp.where(jnp.abs(a_e[1]) < 0.9,
                    jnp.array([0.0, 1.0, 0.0], jnp.float32),
                    jnp.array([1.0, 0.0, 0.0], jnp.float32))
    alt = _normize(jnp.cross(a_e, alt))
    b_e = jnp.where(b_len2 > 1e-12,
                    b_raw / jnp.sqrt(jnp.maximum(b_len2, 1e-20)), alt)

    def residual(psi):
        u = jnp.cos(psi) * a_e + jnp.sin(psi) * b_e
        _, x2, v3, _ = exit_fn(E, m, R, ior, u)
        to_c = _normize(c - x2)
        return (v3 * b_e).sum() * (to_c * a_e).sum() \
            - (v3 * a_e).sum() * (to_c * b_e).sum()

    # Seed: coarse grid over the visible cap, both sides of the axis.
    lim = np.float32(np.pi / 2 - 1e-3)
    grid = jnp.linspace(-lim + 1e-3, lim - 1e-3, 48)
    res_g = jax.vmap(residual)(grid)
    psi = jax.lax.stop_gradient(grid[jnp.argmin(jnp.abs(res_g))])
    for _ in range(n_newton):
        g = residual(psi)
        dg = jax.grad(residual)(psi)
        step = g / jnp.where(jnp.abs(dg) > 1e-12, dg,
                             jnp.where(dg >= 0, 1e-12, -1e-12))
        psi = jnp.clip(psi - step, -lim, lim)
    u0 = jnp.cos(psi) * a_e + jnp.sin(psi) * b_e
    return u0, a_e, b_e


def _glass_point_xy(off, m, R, ior, p, basis, W, H, n_newton: int = 8):
    """Image point [2] of the refracted image of WORLD POINT ``p`` seen
    through the glass sphere (m, R, ior) from lens point origin+off,
    plus validity and the exit point (the viewpoint ``p`` is seen from
    for box silhouette-edge tests) — the refractive analogue of
    ``_curved_mirror_point_xy``."""
    E = basis.origin + off
    u0, _, _ = _glass_chief(E, m, R, ior, p, n_newton)
    x1, x2, v3, tir = _glass_exit_ray(E, m, R, ior, u0)
    to_p = _normize(p - x2)
    aligned = (v3 * to_p).sum() > 0.999
    front = ((x1 - E) * u0).sum() < 0.0
    outside = ((p - m) * (p - m)).sum() > R * R
    xy, cW = _ray_to_xy(x1 - E, off, basis, W, H)
    return xy, (aligned & front & ~tir & outside & (cW < 0.0)), x2


def _glass_sphere_xy(off, m, R, ior, c, r, phi, basis, W, H,
                     n_chief: int = 8, n_newton: int = 8, exit_fn=None):
    """Image point [2] of the refracted silhouette of source sphere
    (c, r) seen THROUGH the glass sphere (m, R, ior) from lens point
    origin+off, at curve parameter ``phi`` — plus validity.

    Same construction as ``_curved_mirror_xy`` with the reflection step
    replaced by the doubly-refracted exit ray (``_glass_exit_ray``): the
    chief solve finds the refracted image of the source center, then a
    tangency Newton along the entry-sphere geodesic at azimuth ``phi``
    finds the entry point whose exit ray is tangent to (c, r).  All
    smooth jnp math: jax differentiates the curve w.r.t. c, r, m, R and
    the IOR through the iterations (implicit-function-exact at
    convergence); TIR / diverged / inside-the-glass configurations are
    masked, and partial occlusion self-gates through the probes (dL~0)
    exactly like every other family."""
    if exit_fn is None:
        exit_fn = _glass_exit_ray
    E = basis.origin + off
    u0, a_e, b_e = _glass_chief(E, m, R, ior, c, n_chief, exit_fn=exit_fn)

    e1 = _normize(jnp.cross(u0, a_e) + 1e-12 * b_e)
    e2 = jnp.cross(u0, e1)
    tdir = jnp.cos(phi) * e1 + jnp.sin(phi) * e2

    def tangency(theta):
        u = _normize(jnp.cos(theta) * u0 + jnp.sin(theta) * tdir)
        x1, x2, v3, tir = exit_fn(E, m, R, ior, u)
        q = c - x2
        t_c = (q * v3).sum()
        d2 = (q * q).sum() - t_c * t_c
        return jnp.sqrt(jnp.maximum(d2, 1e-20)) - r, t_c, x1, tir

    theta = jnp.float32(1e-3)
    for _ in range(n_newton):
        g, _, _, _ = tangency(theta)
        dg = jax.grad(lambda t: tangency(t)[0])(theta)
        step = g / jnp.where(jnp.abs(dg) > 1e-9, dg,
                             jnp.where(dg >= 0, 1e-9, -1e-9))
        theta = jnp.clip(theta - step, 1e-4, np.float32(np.pi / 2 - 1e-3))
    g_fin, t_c, x1, tir = tangency(theta)
    front = ((x1 - E) * _normize(x1 - m)).sum() < 0.0
    outside_src = ((c - m) * (c - m)).sum() > R * R
    ok = ((jnp.abs(g_fin) < 0.05 * jnp.abs(r)) & (t_c > 0.0) & front
          & ~tir & outside_src)
    xy, cW = _ray_to_xy(x1 - E, off, basis, W, H)
    return xy, (ok & (cW < 0.0))


def _curved_mirror_point_xy(off, m, R, p, basis, W, H,
                            n_alhazen: int = 6):
    """Image point [2] of the mirrored image of WORLD POINT ``p`` in the
    sphere mirror (m, R) from lens point origin+off, plus validity.

    The mirrored image of a point needs only the chief (Alhazen) solve —
    no tangency Newton — which is what makes rect/box sources in curved
    mirrors tractable: their boundary segments are point sets, so each
    sample is one chief solve.  Validity requires convergence (the
    reflected ray really points at ``p``), a front-facing reflection
    point, and an in-front image ray.  Also returns the reflection point
    ``x`` (the per-sample viewpoint for box silhouette-edge tests)."""
    E = basis.origin + off
    u0, _, _ = _alhazen_chief(E, m, R, p, n_alhazen)
    x = m + R * u0
    v = _normize(x - E)
    w = v - 2.0 * (v * u0).sum() * u0
    to_p = _normize(p - x)
    aligned = (w * to_p).sum() > 0.999
    front = ((x - E) * u0).sum() < 0.0
    xy, cW = _ray_to_xy(x - E, off, basis, W, H)
    return xy, (aligned & front & (cW < 0.0)), x


def _curved_mirror_xy(off, m, R, c, r, phi, basis, W, H,
                      n_alhazen: int = 4, n_newton: int = 8):
    """Image point [2] of the mirrored silhouette of sphere (c, r) seen
    in the SPHERE mirror (m, R) from eye point ``E``, at curve parameter
    ``phi`` — plus a validity scalar (>0 means converged & front-facing).

    Construction (module docstring "curved mirrors"): the silhouette is
    the set of mirror-surface points x whose reflected ray from E is
    tangent to (c, r).  The chief point (reflected image of ``c``) is
    solved by unrolled Newton on the in-plane Alhazen condition, seeded
    by the bisector heuristic; the curve point at azimuth ``phi`` is then
    a second unrolled-Newton root of the tangency offset along the
    geodesic from the chief point.  Everything is smooth jnp math, so
    jax can differentiate the curve w.r.t. (c, r, m, R) through the
    iterations (gradients are implicit-function-exact at convergence).
    The curve sits ON the mirror surface, so its image position is just
    the direction E -> x — the probes then measure the radiance step
    across it exactly like any direct edge.  ``off`` is the thin-lens
    offset: a curved mirror has NO viewpoint-independent virtual image,
    so the whole solve runs from each sample's lens point E = origin+off.
    """
    E = basis.origin + off
    u0, a_e, b_e = _alhazen_chief(E, m, R, c, n_alhazen)

    # Tangent frame at the chief point.
    e1 = _normize(jnp.cross(u0, a_e) + 1e-12 * b_e)
    e2 = jnp.cross(u0, e1)
    tdir = jnp.cos(phi) * e1 + jnp.sin(phi) * e2

    def tangency(theta):
        u = jnp.cos(theta) * u0 + jnp.sin(theta) * tdir
        x = m + R * u
        v = _normize(x - E)
        w = v - 2.0 * (v * u).sum() * u  # unit reflected direction
        q = c - x
        t_c = (q * w).sum()
        d2 = (q * q).sum() - t_c * t_c
        return jnp.sqrt(jnp.maximum(d2, 1e-20)) - r, t_c, x

    theta = jnp.float32(1e-3)
    for _ in range(n_newton):
        g, _, _ = tangency(theta)
        dg = jax.grad(lambda t: tangency(t)[0])(theta)
        step = g / jnp.where(jnp.abs(dg) > 1e-9, dg,
                             jnp.where(dg >= 0, 1e-9, -1e-9))
        # Clamp steps to stay on the visible cap (|theta| < pi/2).
        theta = jnp.clip(theta - step, 1e-4, np.float32(np.pi / 2 - 1e-3))
    g_fin, t_c, x = tangency(theta)
    n_srf = (x - m) / R
    front = ((x - E) * n_srf).sum() < 0.0
    ok = (jnp.abs(g_fin) < 0.05 * jnp.abs(r)) & (t_c > 0.0) & front
    xy, cW = _ray_to_xy(x - E, off, basis, W, H)
    return xy, (ok & (cW < 0.0))


# The 12 edges of a box: (corner_a, corner_b, face1_axis, face1_is_max,
# face2_axis, face2_is_max).  Corner bit i set -> p1 on axis i, else p0.
_BOX_EDGES = []
for _a3 in range(3):
    _a1, _a2 = (i for i in range(3) if i != _a3)
    for _s1 in (0, 1):
        for _s2 in (0, 1):
            _ca = (_s1 << _a1) | (_s2 << _a2)
            _BOX_EDGES.append((_ca, _ca | (1 << _a3), _a1, _s1, _a2, _s2))
_BOX_EA = np.array([e[0] for e in _BOX_EDGES], np.int32)
_BOX_EB = np.array([e[1] for e in _BOX_EDGES], np.int32)
_BOX_FACE_AX = np.array([[e[2], e[4]] for e in _BOX_EDGES], np.int32)
_BOX_FACE_SGN = np.array([[2 * e[3] - 1, 2 * e[5] - 1] for e in _BOX_EDGES],
                         np.float32)
# Corner bit pattern -> per-axis selector (1.0 = take p1). [8,3]
_BOX_SEL = np.array([[(c >> i) & 1 for i in range(3)] for c in range(8)],
                    np.float32)


def _edge_xy(c, r, phi, off, basis, W, H):
    """Image coordinates [2] of the silhouette point at angle ``phi``
    seen from lens point ``basis.origin + off``.

    Smooth in (c, r, phi); this is the ONLY function the boundary
    gradient differentiates through.
    """
    origin = basis.origin + off
    oc = c - origin
    L2 = (oc * oc).sum()
    L = sqrt_capped_grad(L2, jnp)
    u_ax = oc / L
    sin_a = r / L
    cos_a = sqrt_capped_grad(jnp.maximum(1.0 - sin_a * sin_a, 1e-12), jnp)

    # Stable frame around the view axis: seed with whichever camera basis
    # vector is less parallel to u_ax (both branches stay smooth locally).
    bu, bv = basis.u, basis.v
    seed_v = jnp.where(jnp.abs((u_ax * bu).sum()) < 0.9, bu, bv)
    e1 = jnp.cross(u_ax, seed_v)
    e1 = e1 / sqrt_capped_grad((e1 * e1).sum(), jnp)
    e2 = jnp.cross(u_ax, e1)

    w_dir = cos_a * u_ax + sin_a * (jnp.cos(phi) * e1 + jnp.sin(phi) * e2)
    return _ray_to_xy(w_dir, off, basis, W, H)


def _edge_blocked(c, r, phi, off, basis, gs, Rs):
    """True when the lens->silhouette-point segment crosses any of the
    ``gs``/``Rs`` spheres (hollow-shell outers): the 4-interface family
    owns that boundary term, so the direct family must not also count
    it.  A thin shell deflects the through-image by less than the probe
    offset, so without this gate BOTH families measure the same radiance
    step (hollow-rig measurement: combined ratio 1.46 of FD).  Mirrors
    ``_edge_xy``'s exact frame/edge-point construction; purely primal
    (the caller stop-gradients the inputs)."""
    origin = basis.origin + off
    oc = c - origin
    L = jnp.sqrt(jnp.maximum((oc * oc).sum(), 1e-20))
    u_ax = oc / L
    sin_a = r / L
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 1e-12))
    bu, bv = basis.u, basis.v
    seed_v = jnp.where(jnp.abs((u_ax * bu).sum()) < 0.9, bu, bv)
    e1 = jnp.cross(u_ax, seed_v)
    e1 = e1 / jnp.sqrt(jnp.maximum((e1 * e1).sum(), 1e-20))
    e2 = jnp.cross(u_ax, e1)
    w = cos_a * u_ax + sin_a * (jnp.cos(phi) * e1 + jnp.sin(phi) * e2)
    t_edge = L * cos_a
    oc2 = origin[None, :] - gs  # [G,3]
    b = (oc2 * w[None, :]).sum(-1)  # [G] (w is unit)
    disc = b * b - (oc2 * oc2).sum(-1) + Rs * Rs
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0, t1 = -b - sq, -b + sq
    hit = (disc > 0.0) & (((t0 > 1e-4) & (t0 < t_edge))
                          | ((t1 > 1e-4) & (t1 < t_edge)))
    return hit.any()


def _ray_to_xy(d, offset, basis, W, H):
    """Image coordinates [2] of the thin-lens ray from
    ``basis.origin + offset`` along ``d``: the (s, t) of the focal-plane
    point the ray passes through, inverting camera.rs:85-94
    (direction(s, t) = llc + s H + t V - origin - offset).  H, V and
    fw are orthogonal, so the 3x3 solve decomposes per basis vector.
    ``cW`` < 0 means the ray points in front of the camera.
    """
    Hv, Vv = basis.horizontal, basis.vertical
    fw = basis.origin - basis.lower_left - 0.5 * Hv - 0.5 * Vv
    rel = offset + 0.5 * Hv + 0.5 * Vv + fw  # (origin + offset) - llc
    a = (rel * Hv).sum() / (Hv * Hv).sum()
    b = (rel * Vv).sum() / (Vv * Vv).sum()
    c = (rel * fw).sum() / (fw * fw).sum()
    dH = (d * Hv).sum() / (Hv * Hv).sum()
    dV = (d * Vv).sum() / (Vv * Vv).sum()
    cW = (d * fw).sum() / (fw * fw).sum()  # negative in front
    lam = c / (-cW)  # ray parameter of the focal-plane crossing
    s = a + lam * dH
    t = b + lam * dV
    return jnp.stack([s * (W - 1), t * (H - 1)]), cW


def _dir_to_xy(w_dir, basis, W, H):
    """Pinhole special case of ``_ray_to_xy`` (zero lens offset)."""
    return _ray_to_xy(w_dir, jnp.zeros(3, jnp.float32), basis, W, H)


def _seg_xy(pA, pB, u, off, basis, W, H):
    """Image coordinates [2] of the segment point ``pA + u (pB - pA)``
    seen from lens point ``basis.origin + off``.

    Smooth in (pA, pB, u) — the segment analogue of ``_edge_xy``.  The
    projection of a world segment is an image segment, but xy(u) is
    projective (not affine) in u, so arc length per sample still comes
    from d xy / d u at each sample.
    """
    x = pA + u * (pB - pA)
    return _ray_to_xy(x - basis.origin - off, off, basis, W, H)


def _rect_corners(geom, ids):
    """World-space corners [R, 4, 3] of rect primitives, differentiable
    w.r.t. geom.p0/p1.  Plane tag mapping matches intersect.py's
    ``_rect_components`` (rect.rs:54-58): axis 0 (XY): k on z; axis 1
    (YZ): k on x; axis 2 (ZX): k on y.  Corner order walks the boundary
    so consecutive pairs (0,1),(1,2),(2,3),(3,0) are the 4 edges.
    """
    p0 = geom.p0[ids]
    p1 = geom.p1[ids]
    a0, b0, k = p0[:, 0], p0[:, 1], p0[:, 2]
    a1, b1 = p1[:, 0], p1[:, 1]
    A = jnp.stack([a0, a1, a1, a0], 1)  # [R,4]
    B = jnp.stack([b0, b0, b1, b1], 1)
    K = jnp.broadcast_to(k[:, None], A.shape)
    axis = geom.axis[ids][:, None]
    x = jnp.where(axis == 0, A, jnp.where(axis == 1, K, B))
    y = jnp.where(axis == 0, B, jnp.where(axis == 1, A, K))
    z = jnp.where(axis == 0, K, jnp.where(axis == 1, B, A))
    obj = jnp.stack([x, y, z], -1)  # [R,4,3]
    return (jnp.einsum("rij,rcj->rci", geom.rot[ids], obj)
            + geom.trans[ids][:, None, :])


def _box_corners(geom, ids):
    """World-space corners [B, 8, 3] of solid boxes (corner c takes p1 on
    axis i iff bit i of c), differentiable w.r.t. geom.p0/p1."""
    p0 = geom.p0[ids][:, None, :]  # [B,1,3]
    p1 = geom.p1[ids][:, None, :]
    sel = jnp.asarray(_BOX_SEL)[None]  # [1,8,3]
    obj = p0 * (1.0 - sel) + p1 * sel
    return (jnp.einsum("rij,rcj->rci", geom.rot[ids], obj)
            + geom.trans[ids][:, None, :])


def _box_edge_normals(geom, ids):
    """[B, 12, 2, 3] world outward normals of the two faces adjacent to
    each box edge: sign * (world-from-object rotation column of the face
    axis)."""
    n = geom.rot[ids][:, :, _BOX_FACE_AX]  # [B,3,12,2] columns of R
    return jnp.moveaxis(n, 1, -1) * _BOX_FACE_SGN[None, :, :, None]


def _box_silhouette_mask(geom, ids, corners, origin):
    """[B, 12] bool: edge is a silhouette iff its two adjacent faces
    straddle front/back-facing as seen from ``origin`` (the classic
    mesh-edge test at the edge midpoint; primal-only decision).  The
    runtime path uses the per-SAMPLE variant (sample point + lens point)
    inside ``correction``; this midpoint form serves diagnostics/tests."""
    n = _box_edge_normals(geom, ids)  # [B,12,2,3]
    mid = 0.5 * (corners[:, _BOX_EA] + corners[:, _BOX_EB])  # [B,12,3]
    v = mid - origin
    d1 = (n[:, :, 0, :] * v).sum(-1)
    d2 = (n[:, :, 1, :] * v).sum(-1)
    return (d1 * d2) < 0.0


@deprecate_use_bvh
def make_silhouette_correction(scene, W, H, depth, intersector, leaf_size=4,
                               sphere_ids=None, rect_ids=None,
                               box_ids=None, mirror_ids=None,
                               mirror_sphere_ids=None,
                               glass_sphere_ids=None,
                               glass_shells=None,
                               mirror_pairs_max: int = 64,
                               n_edge: int = 64, n_seg: int = 16,
                               n_probe: int = 2, eps: float = 0.35,
                               glass_fresnel_mirror: bool = True,
                               glass_trt: bool = True):
    """Build correction(arrays, bvh, basis, seed) -> [W*H, 3].

    Zero in the primal; its tangent w.r.t. arrays.geom.p0 / .p1 / .radius
    is the edge-sampled silhouette boundary gradient of the EXPECTED image
    (the per-pixel mean radiance that render/train losses consume).

    ``sphere_ids`` / ``rect_ids`` / ``box_ids``: which primitives get edge
    terms (default: every sphere — moving ones time-sampled — every rect,
    every solid box).  ``mirror_ids``: planar-mirror rects (default:
    every fuzz-0 metal rect, ``mirror_rect_ids_of``); every edge family
    is additionally reflected across each mirror plane (virtual images),
    restoring the boundary term of silhouettes seen through ONE planar
    specular bounce (module docstring).  ``mirror_sphere_ids``: CURVED
    sphere mirrors (default: every static fuzz-0 metal sphere,
    ``mirror_sphere_ids_of``); each (mirror, source-sphere) pair gets a
    curved-mirror silhouette family solved per sample by unrolled
    Alhazen + tangency Newton (``_curved_mirror_xy``), capped at
    ``mirror_pairs_max`` pairs by apparent source size from the mirror
    (host-side build positions).  ``n_edge`` silhouette samples
    per sphere; ``n_seg`` samples per rect/box edge segment; ``n_probe``
    independent radiance probes per side; ``eps`` probe offset from the
    edge in pixels (bias O(eps); below ~0.2 the probes start landing on
    the wrong side of the curve at f32 precision).

    Moving spheres: each silhouette sample carries a shutter time (a
    stratified lattice over [basis.time0, basis.time1), golden-ratio
    rotated per sphere); the sampled center c(t) moves the circle and the
    radiance probes trace at the SAME time, so the estimator integrates
    the boundary term over the shutter — the motion-blur analogue of the
    static estimator, differentiable w.r.t. both center endpoints.
    """
    from ..render import WavefrontState, make_ray_colorer

    if sphere_ids is None:
        sphere_ids = sphere_ids_of(scene)
    if rect_ids is None:
        rect_ids = rect_ids_of(scene)
    if box_ids is None:
        box_ids = box_ids_of(scene)
    if mirror_ids is None:
        mirror_ids = mirror_rect_ids_of(scene)
    if mirror_sphere_ids is None:
        mirror_sphere_ids = mirror_sphere_ids_of(scene)
    if glass_sphere_ids is None:
        glass_sphere_ids = glass_sphere_ids_of(scene)
    sphere_ids = np.asarray(sphere_ids, np.int32)
    rect_ids = np.asarray(rect_ids, np.int32)
    box_ids = np.asarray(box_ids, np.int32)
    mirror_ids = np.asarray(mirror_ids, np.int32)
    mirror_sphere_ids = np.asarray(mirror_sphere_ids, np.int32)
    glass_sphere_ids = np.asarray(glass_sphere_ids, np.int32)
    S, E = int(sphere_ids.shape[0]), int(n_edge)
    R, B, E2 = int(rect_ids.shape[0]), int(box_ids.shape[0]), int(n_seg)
    M = int(mirror_ids.shape[0])

    # Curved-mirror (mirror sphere, source sphere) pairs, largest apparent
    # source first (host-side, baked build positions).
    pairs_m, pairs_s = [], []
    g_host = scene.arrays.geom
    # External-Fresnel mirrors: a glass sphere's SURFACE also reflects
    # (Schlick, ~4-10% off-normal — dielectric.rs:47-50 samples that
    # branch with probability reflectance()), so every source silhouette
    # has a reflected image ON the glass, exactly the curved-mirror
    # geometry.  The probes self-gate the magnitude (they measure the
    # actual Fresnel-weighted radiance step across the curve), so glass
    # spheres simply join the curved-mirror bender set.  Benders the
    # camera sits INSIDE (e.g. a whole-scene dielectric boundary) are
    # skipped host-side — every sample would fail the front test anyway.
    cam_o = np.asarray(scene.camera.look_from, np.float64)
    # Shell OUTERS join the Fresnel-mirror benders too: the outer
    # surface's external reflection is agnostic to what is inside the
    # ball (they are excluded from the solid T*T/T*R*T families and get
    # the 4-interface through-family below instead).
    if glass_shells is None:
        glass_shells = glass_shell_pairs_of(scene)
    glass_shells = np.asarray(glass_shells,
                              np.int32).reshape(-1, 2)
    _shell_outer_ids = [int(p[0]) for p in glass_shells]
    _gl_out = [int(g) for g in
               list(glass_sphere_ids) + _shell_outer_ids
               if glass_fresnel_mirror
               and np.linalg.norm(np.asarray(g_host.p0)[int(g)] - cam_o)
               > abs(float(np.asarray(g_host.radius)[int(g)])) * 1.001]
    refl_bender_ids = np.concatenate(
        [mirror_sphere_ids, np.asarray(_gl_out, np.int32)])
    for ms in refl_bender_ids:
        srcs = sphere_ids[sphere_ids != ms]
        if srcs.size == 0:
            continue
        c0 = np.asarray(g_host.p0)[srcs]
        rr = np.abs(np.asarray(g_host.radius)[srcs])
        mm = np.asarray(g_host.p0)[int(ms)]
        app = rr / np.maximum(np.linalg.norm(c0 - mm, axis=-1), 1e-6)
        keep = np.argsort(-app, kind="stable")[:mirror_pairs_max]
        pairs_m.extend(int(ms) for _ in keep)
        pairs_s.extend(int(v) for v in srcs[keep])
    pairs_m = np.asarray(pairs_m, np.int32)
    pairs_s = np.asarray(pairs_s, np.int32)
    Q = int(pairs_m.shape[0])

    # Refractive (glass sphere, source sphere) pairs — same apparent-size
    # ranking as the curved mirrors.
    gp_g, gp_s = [], []
    for gs in glass_sphere_ids:
        srcs = sphere_ids[sphere_ids != gs]
        if srcs.size == 0:
            continue
        c0 = np.asarray(g_host.p0)[srcs]
        rr = np.abs(np.asarray(g_host.radius)[srcs])
        gg = np.asarray(g_host.p0)[int(gs)]
        app = rr / np.maximum(np.linalg.norm(c0 - gg, axis=-1), 1e-6)
        keep = np.argsort(-app, kind="stable")[:mirror_pairs_max]
        gp_g.extend(int(gs) for _ in keep)
        gp_s.extend(int(v) for v in srcs[keep])
    gp_g = np.asarray(gp_g, np.int32)
    gp_s = np.asarray(gp_s, np.int32)
    GQ = int(gp_g.shape[0])

    # Hollow-shell (outer, inner, source-sphere) pairs: concentric
    # dielectric pairs get the 4-interface through-family
    # (_glass_shell_exit_ray) instead of the solid-ball T*T — the solid
    # optics is wrong for them (glass_sphere_ids_of excludes shell
    # outers; they re-join the external-Fresnel bender set above via
    # ``shell_pairs`` since their outer-surface reflection is geometry-
    # inside-agnostic).  Sphere sources only; rect/box sources through
    # shells stay out of scope (module docstring).
    shp_g, shp_in, shp_s = [], [], []
    for so, si in glass_shells:
        srcs = sphere_ids[(sphere_ids != so) & (sphere_ids != si)]
        if srcs.size == 0:
            continue
        c0 = np.asarray(g_host.p0)[srcs]
        rr = np.abs(np.asarray(g_host.radius)[srcs])
        gg0 = np.asarray(g_host.p0)[int(so)]
        app = rr / np.maximum(np.linalg.norm(c0 - gg0, axis=-1), 1e-6)
        keep = np.argsort(-app, kind="stable")[:mirror_pairs_max]
        shp_g.extend(int(so) for _ in keep)
        shp_in.extend(int(si) for _ in keep)
        shp_s.extend(int(v) for v in srcs[keep])
    shp_g = np.asarray(shp_g, np.int32)
    shp_in = np.asarray(shp_in, np.int32)
    shp_s = np.asarray(shp_s, np.int32)
    SQ = int(shp_g.shape[0])

    # Segment pairs through CURVED mirrors and GLASS spheres (rect/box
    # sources): one shared host-side bake of every boundary segment's
    # midpoint/length, then per-bender apparent-size ranking.  Row r of
    # the base segment arrays = rect r//4's edge r%4 for r < 4R, else
    # box (r-4R)//12's edge (r-4R)%12.
    K0 = 4 * R + 12 * B
    host_mid = host_len = None
    if K0 and (len(mirror_sphere_ids) or len(glass_sphere_ids)):
        mids, lens = [], []
        if R > 0:
            rc_h = np.asarray(_rect_corners(g_host, rect_ids))
            a = rc_h.reshape(-1, 3)
            bb = np.roll(rc_h, -1, axis=1).reshape(-1, 3)
            mids.append(0.5 * (a + bb))
            lens.append(np.linalg.norm(bb - a, axis=-1))
        if B > 0:
            bc_h = np.asarray(_box_corners(g_host, box_ids))
            a = bc_h[:, _BOX_EA].reshape(-1, 3)
            bb = bc_h[:, _BOX_EB].reshape(-1, 3)
            mids.append(0.5 * (a + bb))
            lens.append(np.linalg.norm(bb - a, axis=-1))
        host_mid = np.concatenate(mids)
        host_len = np.concatenate(lens)

    def _rank_segments(bender_ids):
        """Per bender: the mirror_pairs_max largest-apparent segments."""
        bm, bsel = [], []
        if host_mid is not None:
            for bi in bender_ids:
                bp = np.asarray(g_host.p0)[int(bi)]
                app = host_len / np.maximum(
                    np.linalg.norm(host_mid - bp, axis=-1), 1e-6)
                keep = np.argsort(-app, kind="stable")[:mirror_pairs_max]
                bm.extend(int(bi) for _ in keep)
                bsel.extend(int(v) for v in keep)
        return np.asarray(bm, np.int32), np.asarray(bsel, np.int32)

    cms_m, cms_sel = _rank_segments(refl_bender_ids)
    Q2 = int(cms_m.shape[0])
    gls_g, gls_sel = _rank_segments(glass_sphere_ids)
    GQ2 = int(gls_g.shape[0])
    # Self-exclusion: a mirror's own edges reflected across its own plane
    # land exactly on themselves — keeping them would double-count the
    # mirror's boundary term.  [M, 4R] static mask of excluded segment
    # rows (rect r owns segment rows 4r..4r+3).
    if M and R:
        _mir_excl = np.repeat(rect_ids[None, :] == mirror_ids[:, None],
                              4, axis=1)
    else:
        _mir_excl = np.zeros((M, 4 * R), bool)
    colorer = make_ray_colorer(scene, W, H, depth, intersector, leaf_size,
                               differentiable=False)
    phis = (np.arange(E, dtype=np.float32) + 0.5) * (2.0 * np.pi / E)
    us = (np.arange(E2, dtype=np.float32) + 0.5) * (1.0 / E2)
    # Shutter-time lattice [S, E]: stratified over the sample index,
    # golden-ratio rotated per sphere (static spheres ignore it — their
    # center lerp is constant).
    tfracs = np.mod((np.arange(E, dtype=np.float64) + 0.5) / E
                    + 0.6180339887 * np.arange(max(S, 1))[:, None],
                    1.0).astype(np.float32)

    # Lens lattice: concentric-disk points per edge sample.  All-zero for
    # a pinhole camera (aperture 0), where the estimator reduces exactly
    # to the lens-free form; with aperture the boundary term is averaged
    # over the lens disk and each probe traces from its sample's lens
    # point (the defocus analogue of the time-sampled moving edge).
    _lr = np.float32(float(scene.camera.aperture) / 2.0)

    def _disk(rows, cols, salt):
        i = np.arange(cols, dtype=np.float64) + 0.5
        rows_i = np.arange(max(rows, 1), dtype=np.float64)[:, None]
        u1 = np.mod(i * 0.7548776662 + 0.331 * salt * (rows_i + 1.0), 1.0)
        u2 = np.mod(i * 0.5698402910 + 0.773 * salt * (rows_i + 2.0), 1.0)
        rr = np.sqrt(u1)
        th = 2.0 * np.pi * u2
        return np.stack([rr * np.cos(th), rr * np.sin(th)],
                        -1).astype(np.float32)

    disk_sph = _disk(S, E, 1.0) * _lr  # [S,E,2]
    disk_seg = _disk(4 * R + 12 * B, E2, 2.0) * _lr  # [K,E2,2]
    disk_q = _disk(Q, E, 3.0) * _lr  # [Q,E,2]
    disk_q2 = _disk(Q2, E2, 4.0) * _lr  # [Q2,E2,2]
    disk_g = _disk(GQ, E, 5.0) * _lr  # [GQ,E,2]
    disk_g2 = _disk(GQ2, E2, 6.0) * _lr  # [GQ2,E2,2]
    disk_g3 = _disk(GQ, E, 7.0) * _lr  # [GQ,E,2] (T*R*T family)
    disk_sh = _disk(SQ, E, 8.0) * _lr  # [SQ,E,2] (hollow-shell family)
    tfracs_q = np.mod((np.arange(E, dtype=np.float64) + 0.5) / E
                      + 0.6180339887 * np.arange(max(Q, 1))[:, None],
                      1.0).astype(np.float32)
    tfracs_g = np.mod((np.arange(E, dtype=np.float64) + 0.5) / E
                      + 0.6180339887 * np.arange(max(GQ, 1))[:, None],
                      1.0).astype(np.float32)
    tfracs_sh = np.mod((np.arange(E, dtype=np.float64) + 0.5) / E
                       + 0.6180339887 * np.arange(max(SQ, 1))[:, None],
                       1.0).astype(np.float32)

    # inner vmap: per-sample (center_at_time, phi, lens point); outer:
    # per sphere / per segment.
    xy_fn = jax.vmap(jax.vmap(_edge_xy, in_axes=(0, None, 0, 0,
                                                 None, None, None)),
                     in_axes=(0, 0, None, 0, None, None, None))
    tan_fn = jax.vmap(jax.vmap(jax.jacfwd(lambda c, r, p, o, b:
                                          _edge_xy(c, r, p, o, b, W,
                                                   H)[0],
                                          argnums=2),
                               in_axes=(0, None, 0, 0, None)),
                      in_axes=(0, 0, None, 0, None))
    # Curved-mirror family: inner vmap over the E samples (lens offset,
    # time-lerped source center, curve parameter), outer over pairs.
    cm_xy_fn = jax.vmap(
        jax.vmap(_curved_mirror_xy,
                 in_axes=(0, None, None, 0, None, 0, None, None, None)),
        in_axes=(0, 0, 0, 0, 0, None, None, None, None))
    cm_tan_fn = jax.vmap(
        jax.vmap(jax.jacfwd(
            lambda off, mc, mr, c, r, p, b:
            _curved_mirror_xy(off, mc, mr, c, r, p, b, W, H)[0],
            argnums=5),
            in_axes=(0, None, None, 0, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, None, None))

    # Refractive family (glass spheres): identical vmap shape with the
    # reflection solve swapped for the double-refraction solve; the IOR
    # rides as an extra traced (differentiable) argument.
    gl_xy_fn = jax.vmap(
        jax.vmap(_glass_sphere_xy,
                 in_axes=(0, None, None, None, 0, None, 0,
                          None, None, None)),
        in_axes=(0, 0, 0, 0, 0, 0, None, None, None, None))
    gl_tan_fn = jax.vmap(
        jax.vmap(jax.jacfwd(
            lambda off, gc, gr, ior, c, r, p, b:
            _glass_sphere_xy(off, gc, gr, ior, c, r, p, b, W, H)[0],
            argnums=6),
            in_axes=(0, None, None, None, 0, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, 0, None, None))

    gl_trt_xy_fn = jax.vmap(
        jax.vmap(lambda off, gc, gr, ior, c, r, p, b:
                 _glass_sphere_xy(off, gc, gr, ior, c, r, p, b, W, H,
                                  exit_fn=_glass_trt_exit_ray),
                 in_axes=(0, None, None, None, 0, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, 0, None, None))

    # Hollow-shell family: the same sphere-source solve with the
    # 4-interface exit ray; the bubble radius Ri rides as one more
    # vmapped (traced, differentiable) argument via closure.
    def _shell_xy(off, gc, gr, gri, ior, c, r, p, b):
        return _glass_sphere_xy(
            off, gc, gr, ior, c, r, p, b, W, H,
            exit_fn=lambda E2, m2, R2, io2, u2:
            _glass_shell_exit_ray(E2, m2, R2, io2, u2, gri))

    sh_xy_fn = jax.vmap(
        jax.vmap(_shell_xy,
                 in_axes=(0, None, None, None, None, 0, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
    sh_tan_fn = jax.vmap(
        jax.vmap(jax.jacfwd(
            lambda off, gc, gr, gri, ior, c, r, p, b:
            _shell_xy(off, gc, gr, gri, ior, c, r, p, b)[0],
            argnums=7),
            in_axes=(0, None, None, None, None, 0, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
    gl_trt_tan_fn = jax.vmap(
        jax.vmap(jax.jacfwd(
            lambda off, gc, gr, ior, c, r, p, b:
            _glass_sphere_xy(off, gc, gr, ior, c, r, p, b, W, H,
                             exit_fn=_glass_trt_exit_ray)[0],
            argnums=6),
            in_axes=(0, None, None, None, 0, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, 0, None, None))

    def _gl_seg(off, gc, gr, ior, pa, pb, u, b):
        return _glass_point_xy(off, gc, gr, ior, pa + u * (pb - pa),
                               b, W, H)

    gls_xy_fn = jax.vmap(
        jax.vmap(_gl_seg,
                 in_axes=(0, None, None, None, None, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, 0, None, None))
    gls_tan_fn = jax.vmap(
        jax.vmap(jax.jacfwd(
            lambda off, gc, gr, ior, pa, pb, u, b:
            _gl_seg(off, gc, gr, ior, pa, pb, u, b)[0], argnums=6),
            in_axes=(0, None, None, None, None, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, 0, None, None))
    glp_cen_fn = jax.vmap(
        lambda gc, gr, ior, p, b: _glass_point_xy(
            jnp.zeros(3, jnp.float32), gc, gr, ior, p, b, W, H)[:2],
        in_axes=(0, 0, 0, 0, None))

    # Curved-mirror segment family: per (mirror, segment) pair, each
    # sample is one Alhazen chief solve of the segment point's mirrored
    # image.
    def _cm_seg(off, mc, mr, pa, pb, u, b):
        return _curved_mirror_point_xy(off, mc, mr, pa + u * (pb - pa),
                                       b, W, H)

    cms_xy_fn = jax.vmap(
        jax.vmap(_cm_seg, in_axes=(0, None, None, None, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, None, None))
    cms_tan_fn = jax.vmap(
        jax.vmap(jax.jacfwd(
            lambda off, mc, mr, pa, pb, u, b:
            _cm_seg(off, mc, mr, pa, pb, u, b)[0], argnums=5),
            in_axes=(0, None, None, None, None, 0, None)),
        in_axes=(0, 0, 0, 0, 0, None, None))
    cmp_cen_fn = jax.vmap(
        lambda mc, mr, p, b: _curved_mirror_point_xy(
            jnp.zeros(3, jnp.float32), mc, mr, p, b, W, H)[:2],
        in_axes=(0, 0, 0, None))

    seg_xy_fn = jax.vmap(jax.vmap(_seg_xy, in_axes=(None, None, 0, 0,
                                                    None, None, None)),
                         in_axes=(0, 0, None, 0, None, None, None))
    seg_tan_fn = jax.vmap(jax.vmap(jax.jacfwd(lambda a, b, u, o, bs:
                                              _seg_xy(a, b, u, o, bs,
                                                      W, H)[0],
                                              argnums=2),
                                   in_axes=(None, None, 0, 0, None)),
                          in_axes=(0, 0, None, 0, None))

    def _probe_radiance(arrays, bvh, basis, xy, time, offs, seed):
        """Trace rays from lens points ``origin + offs`` [M, 3] through
        focal-plane image points ``xy`` [M, 2] at shutter times ``time``
        [M]; return mean radiance over ``n_probe`` independent probes."""
        M = xy.shape[0]
        s = xy[:, 0] / np.float32(W - 1)
        t = xy[:, 1] / np.float32(H - 1)
        o = jnp.broadcast_to(basis.origin, (M, 3)) + offs
        d = (basis.lower_left + s[:, None] * basis.horizontal
             + t[:, None] * basis.vertical - basis.origin - offs)
        out = jnp.zeros((M, 3), jnp.float32)
        for p in range(n_probe):
            base = prng.ray_base(seed ^ np.uint32(0x51E77E00 + p),
                                 jnp.arange(M, dtype=jnp.uint32),
                                 jnp.full((M,), p, jnp.uint32))
            zero3 = o * 0.0
            st = WavefrontState(
                o=o, d=d, time=zero3[:, 0] + time, base=base,
                alive=zero3[:, 0] + 1.0 > 0.0, throughput=zero3 + 1.0,
                radiance=zero3,
            )
            st = colorer.bounce_scan(arrays, bvh, st, jnp.uint32(0), depth)
            out = out + st.radiance
        return out / np.float32(n_probe)

    sg = jax.lax.stop_gradient

    def _corners_center_xy(corners, basis):
        """Primal [K, 2]: mean image position of each primitive's
        projected corners.  The projection of a convex solid is convex,
        so normals pointing away from the corner mean point out of the
        silhouette."""
        xy, _ = jax.vmap(jax.vmap(
            lambda p, b: _dir_to_xy(p - b.origin, b, W, H),
            in_axes=(0, None)), in_axes=(0, None))(corners, basis)
        return xy.mean(1)

    def _finish_part(xy, tau, cen_xy, pre_valid):
        """From traced sample positions ``xy`` [K,M,2], primal curve
        tangents ``tau``, a primal per-curve orientation anchor
        ``cen_xy`` [K,1,2] (normals point away from it) and a primal
        validity mask, produce the flat (xy traced, xy primal, normal,
        weight, pixel) sample arrays.  ``weight`` folds the arc length
        per sample (|tau| already includes the parameter span / count)."""
        xy_p = sg(xy)
        tau_p = sg(tau)
        tau_len = jnp.sqrt((tau_p * tau_p).sum(-1) + 1e-20)
        nrm = jnp.stack([tau_p[..., 1], -tau_p[..., 0]], -1) / (
            tau_len[..., None])
        flip = ((nrm * (xy_p - cen_xy)).sum(-1) < 0.0)
        nrm = jnp.where(flip[..., None], -nrm, nrm)

        ix = jnp.floor(xy_p[..., 0]).astype(jnp.int32)
        iy = jnp.floor(xy_p[..., 1]).astype(jnp.int32)
        inside_img = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
        valid = pre_valid & inside_img
        pix = (jnp.clip(iy, 0, H - 1) * W
               + jnp.clip(ix, 0, W - 1)).reshape(-1)
        wgt = (tau_len * valid.astype(jnp.float32)).reshape(-1)
        return (xy.reshape(-1, 2), xy_p.reshape(-1, 2),
                nrm.reshape(-1, 2), wgt, pix)

    def correction(arrays, bvh, basis, seed):
        if S + R + B + Q + GQ + SQ == 0:
            # Nothing edge-worthy in the scene (e.g. pure media): the
            # correction is identically zero rather than a crash.
            return jnp.zeros((W * H, 3), jnp.float32)
        geom = arrays.geom
        parts = []
        times = []
        offsets = []

        def _lens_offsets(disk):
            return (disk[..., 0:1] * basis.u + disk[..., 1:2] * basis.v)

        # Mirror planes (differentiable in the rect's trainable offset).
        if M > 0:
            pl_pnt, pl_nrm = _mirror_planes(geom, mirror_ids)

        if S > 0:
            p0s = geom.p0[sphere_ids]  # [S,3] traced (gradient path)
            p1s = geom.p1[sphere_ids]
            r = geom.radius[sphere_ids]  # [S]
            # Center at each sample's shutter time (moving_sphere.rs
            # lerp; static spheres have p1 == p0 so frac cancels).
            tt = (basis.time0
                  + jnp.asarray(tfracs) * (basis.time1 - basis.time0))
            ts0 = geom.time0[sphere_ids][:, None]
            ts1 = geom.time1[sphere_ids][:, None]
            frac = (tt - ts0) / (ts1 - ts0)
            c = p0s[:, None, :] + frac[..., None] * (p1s - p0s)[:, None, :]
            # Virtual images: one extra sphere family per mirror
            # (reflection is affine, so the time-lerped center reflects
            # to a time-lerped virtual center).
            c_fams = [c] + [_reflect_pts(c, pl_pnt[m], pl_nrm[m])
                            for m in range(M)]
            c_all = jnp.concatenate(c_fams)  # [(M+1)S, E, 3]
            nf = M + 1
            r_all = jnp.tile(r, nf)
            tt_all = jnp.tile(tt, (nf, 1))
            phi = jnp.asarray(phis)
            off_s = jnp.tile(_lens_offsets(jnp.asarray(disk_sph)),
                             (nf, 1, 1))  # [(M+1)S, E, 3]
            xy, cW = xy_fn(c_all, r_all, phi, off_s, basis, W, H)
            tau = tan_fn(c_all, r_all, phi, off_s, basis) * (_TWO_PI / E)
            # In front of the camera AND lens point outside the sphere.
            L_cam = jnp.sqrt(
                ((sg(c_all) - basis.origin - off_s) ** 2).sum(-1))
            pre = (sg(cW) < 0.0) & (L_cam > sg(r_all)[:, None] * 1.001)
            if _shell_outer_ids:
                # Double-count gate (_edge_blocked): direct-family rows
                # (the first S of the (M+1)S stack) whose lens->edge
                # segment crosses a hollow-shell outer are owned by the
                # 4-interface family below.  Virtual (mirror-image)
                # rows keep their samples — through-mirror-through-shell
                # composites are out of scope (module docstring).
                _sids = np.asarray(_shell_outer_ids, np.int32)
                blk = jax.vmap(jax.vmap(
                    _edge_blocked,
                    in_axes=(0, None, 0, 0, None, None, None)),
                    in_axes=(0, 0, None, 0, None, None, None))(
                    sg(c), sg(r), jnp.asarray(phis), off_s[:S], basis,
                    sg(geom.p0[_sids]), sg(jnp.abs(geom.radius[_sids])))
                pre = jnp.concatenate([pre[:S] & ~blk, pre[S:]], axis=0)
            cen = sg(xy).mean(1, keepdims=True)
            parts.append(_finish_part(xy, tau, cen, pre))
            times.append(tt_all.reshape(-1))
            offsets.append(off_s.reshape(-1, 3))

        if Q > 0:
            # Curved-mirror silhouettes: one family per (sphere mirror,
            # source sphere) pair, the curve solved on the mirror surface
            # per sample (_curved_mirror_xy).  Sources may be moving
            # (time-lerped center per sample); mirrors are static.
            mq = geom.p0[pairs_m]  # [Q,3]
            Rq = jnp.abs(geom.radius[pairs_m])
            p0q = geom.p0[pairs_s]
            p1q = geom.p1[pairs_s]
            rq = jnp.abs(geom.radius[pairs_s])
            ttq = (basis.time0
                   + jnp.asarray(tfracs_q) * (basis.time1 - basis.time0))
            tq0 = geom.time0[pairs_s][:, None]
            tq1 = geom.time1[pairs_s][:, None]
            frq = (ttq - tq0) / (tq1 - tq0)
            cq = p0q[:, None, :] + frq[..., None] * (p1q - p0q)[:, None, :]
            off_q = _lens_offsets(jnp.asarray(disk_q))  # [Q,E,3]
            phi = jnp.asarray(phis)
            xy, okq = cm_xy_fn(off_q, mq, Rq, cq, rq, phi, basis, W, H)
            tau = cm_tan_fn(off_q, mq, Rq, cq, rq, phi, basis) \
                * (_TWO_PI / E)
            # Sanitize diverged lanes BEFORE they meet any weight: a NaN
            # xy/tau on a masked lane would still poison the scatter
            # (NaN * 0 = NaN).
            okq3 = okq[..., None]
            xy = jnp.where(okq3, xy, 0.0)
            tau = jnp.where(sg(okq3), sg(tau), 1.0)
            # Orientation anchor: masked centroid of the converged lanes.
            wsum = jnp.maximum(sg(okq3).sum(1, keepdims=True), 1)
            cen = sg(xy).sum(1, keepdims=True) / wsum
            parts.append(_finish_part(xy, tau, cen, okq))
            times.append(ttq.reshape(-1))
            offsets.append(off_q.reshape(-1, 3))

        if GQ > 0:
            # Refracted silhouettes: one family per (glass sphere, source
            # sphere) pair, the curve solved per sample on the glass entry
            # surface (_glass_sphere_xy).  Sources may be moving; glass
            # spheres are static; the IOR is the traced material value, so
            # even d(image)/d(ior) carries the boundary term.
            gg = geom.p0[gp_g]  # [GQ,3]
            Rg = jnp.abs(geom.radius[gp_g])
            iorg = arrays.materials.ior[geom.material[gp_g]]
            p0g = geom.p0[gp_s]
            p1g = geom.p1[gp_s]
            rg = jnp.abs(geom.radius[gp_s])
            ttg = (basis.time0
                   + jnp.asarray(tfracs_g) * (basis.time1 - basis.time0))
            tg0 = geom.time0[gp_s][:, None]
            tg1 = geom.time1[gp_s][:, None]
            frg = (ttg - tg0) / (tg1 - tg0)
            cg = p0g[:, None, :] + frg[..., None] * (p1g - p0g)[:, None, :]
            off_g2 = _lens_offsets(jnp.asarray(disk_g))  # [GQ,E,3]
            phi = jnp.asarray(phis)
            xy, okg = gl_xy_fn(off_g2, gg, Rg, iorg, cg, rg, phi,
                               basis, W, H)
            tau = gl_tan_fn(off_g2, gg, Rg, iorg, cg, rg, phi, basis) \
                * (_TWO_PI / E)
            okg3 = okg[..., None]
            xy = jnp.where(okg3, xy, 0.0)  # sanitize diverged lanes
            tau = jnp.where(sg(okg3), sg(tau), 1.0)
            wsum = jnp.maximum(sg(okg3).sum(1, keepdims=True), 1)
            cen = sg(xy).sum(1, keepdims=True) / wsum
            parts.append(_finish_part(xy, tau, cen, okg))
            times.append(ttg.reshape(-1))
            offsets.append(off_g2.reshape(-1, 3))

        if GQ > 0 and glass_trt:
            # Internal-Fresnel (T*R*T) silhouettes: the same (glass,
            # source) pairs, solved with the internal-reflection exit ray
            # (_glass_trt_exit_ray).  dielectric.rs:47-50 routes
            # reflectance(cos, ratio) of the interior flux into this
            # branch, so the image carries a genuine radiance step; the
            # probes measure it directly (self-gated magnitude, like
            # every family).
            off_g3 = _lens_offsets(jnp.asarray(disk_g3))
            xy, okg = gl_trt_xy_fn(off_g3, gg, Rg, iorg, cg, rg, phi,
                                   basis)
            tau = gl_trt_tan_fn(off_g3, gg, Rg, iorg, cg, rg, phi,
                                basis) * (_TWO_PI / E)
            okg3 = okg[..., None]
            xy = jnp.where(okg3, xy, 0.0)  # sanitize diverged lanes
            tau = jnp.where(sg(okg3), sg(tau), 1.0)
            wsum = jnp.maximum(sg(okg3).sum(1, keepdims=True), 1)
            cen = sg(xy).sum(1, keepdims=True) / wsum
            parts.append(_finish_part(xy, tau, cen, okg))
            times.append(ttg.reshape(-1))
            offsets.append(off_g3.reshape(-1, 3))

        if SQ > 0:
            # Hollow-shell silhouettes: one family per (shell, source
            # sphere) pair, the tangency curve solved with the
            # 4-interface exit ray (_glass_shell_exit_ray).  The outer
            # radius, BUBBLE radius (|negative inner|), and IOR are all
            # traced, so d(image)/d(each) carries the boundary term.
            gsh = geom.p0[shp_g]  # [SQ,3]
            Rsh = jnp.abs(geom.radius[shp_g])
            Rin = jnp.abs(geom.radius[shp_in])
            iors = arrays.materials.ior[geom.material[shp_g]]
            p0s_ = geom.p0[shp_s]
            p1s_ = geom.p1[shp_s]
            rs_ = jnp.abs(geom.radius[shp_s])
            tts = (basis.time0
                   + jnp.asarray(tfracs_sh)
                   * (basis.time1 - basis.time0))
            ts0_ = geom.time0[shp_s][:, None]
            ts1_ = geom.time1[shp_s][:, None]
            frs = (tts - ts0_) / (ts1_ - ts0_)
            cs_ = p0s_[:, None, :] \
                + frs[..., None] * (p1s_ - p0s_)[:, None, :]
            off_sh = _lens_offsets(jnp.asarray(disk_sh))  # [SQ,E,3]
            phi = jnp.asarray(phis)
            xy, oks = sh_xy_fn(off_sh, gsh, Rsh, Rin, iors, cs_, rs_,
                               phi, basis)
            tau = sh_tan_fn(off_sh, gsh, Rsh, Rin, iors, cs_, rs_,
                            phi, basis) * (_TWO_PI / E)
            oks3 = oks[..., None]
            xy = jnp.where(oks3, xy, 0.0)  # sanitize diverged lanes
            tau = jnp.where(sg(oks3), sg(tau), 1.0)
            wsum = jnp.maximum(sg(oks3).sum(1, keepdims=True), 1)
            cen = sg(xy).sum(1, keepdims=True) / wsum
            parts.append(_finish_part(xy, tau, cen, oks))
            times.append(tts.reshape(-1))
            offsets.append(off_sh.reshape(-1, 3))

        segA = []
        segB = []
        seg_cen = []
        seg_n = []
        seg_keep = []
        rc = bc = None
        if R > 0:
            rc = _rect_corners(geom, rect_ids)  # [R,4,3]
        if B > 0:
            bc = _box_corners(geom, box_ids)  # [B,8,3]
            bn = _box_edge_normals(sg(geom), box_ids)  # [B,12,2,3]

        def _add_seg_family(refl=None, keep_rects=None):
            """Append one segment family (the direct one, or its virtual
            image across mirror ``refl`` = (pnt, nrm)); ``keep_rects``
            masks out excluded rect segment rows (mirror self-images)."""
            if R > 0:
                c4 = rc if refl is None else _reflect_pts(rc, *refl)
                segA.append(c4.reshape(-1, 3))
                segB.append(jnp.roll(c4, -1, axis=1).reshape(-1, 3))
                cen_xy = _corners_center_xy(sg(c4), basis)  # [R,2]
                seg_cen.append(jnp.repeat(cen_xy, 4, axis=0))
                # Rect boundary segments are silhouettes from everywhere —
                # zero normals mark "no face test".
                seg_n.append(jnp.zeros((R * 4, 2, 3), jnp.float32))
                seg_keep.append(np.ones(R * 4, bool) if keep_rects is None
                                else keep_rects)
            if B > 0:
                c8 = bc if refl is None else _reflect_pts(bc, *refl)
                segA.append(c8[:, _BOX_EA].reshape(-1, 3))
                segB.append(c8[:, _BOX_EB].reshape(-1, 3))
                cen_xy = _corners_center_xy(sg(c8), basis)  # [B,2]
                seg_cen.append(jnp.repeat(cen_xy, 12, axis=0))
                n_f = bn if refl is None else _reflect_dirs(
                    bn, sg(refl[1])[None, None, None, :])
                seg_n.append(n_f.reshape(-1, 2, 3))
                seg_keep.append(np.ones(B * 12, bool))

        if R + B > 0:
            _add_seg_family()
            for m in range(M):
                _add_seg_family(refl=(pl_pnt[m], pl_nrm[m]),
                                keep_rects=~_mir_excl[m] if R else None)
        if segA:
            n_fam = 1 + M
            pA = jnp.concatenate(segA)  # [K,3]
            pB = jnp.concatenate(segB)
            u = jnp.asarray(us)
            off_g = jnp.tile(_lens_offsets(jnp.asarray(disk_seg)),
                             (n_fam, 1, 1))  # [K,E2,3]
            xy, cW = seg_xy_fn(pA, pB, u, off_g, basis, W, H)  # [K,E2,2]
            tau = seg_tan_fn(pA, pB, u, off_g, basis) * (1.0 / E2)
            # Per-sample silhouette test for box edges: the sample point
            # against its two adjacent face normals from ITS lens point
            # (view-dependent, hence sample-dependent under aperture).
            n12 = jnp.concatenate(seg_n)  # [K,2,3]
            is_box = (n12 * n12).sum((-1, -2)) > 0.0
            x_p = (sg(pA)[:, None, :]
                   + u[None, :, None] * (sg(pB) - sg(pA))[:, None, :])
            v = x_p - basis.origin - off_g
            d1 = (n12[:, None, 0, :] * v).sum(-1)
            d2 = (n12[:, None, 1, :] * v).sum(-1)
            sil = jnp.where(is_box[:, None], (d1 * d2) < 0.0, True)
            keep = jnp.asarray(np.concatenate(seg_keep))[:, None]
            pre = sil & (sg(cW) < 0.0) & keep
            cen = jnp.concatenate(seg_cen)[:, None, :]
            parts.append(_finish_part(xy, tau, cen, pre))
            mid = basis.time0 + 0.5 * (basis.time1 - basis.time0)
            times.append(jnp.full((xy.shape[0] * xy.shape[1],), mid,
                                  jnp.float32))
            offsets.append(off_g.reshape(-1, 3))

        def _seg_bank():
            """Every rect/box boundary segment (traced, gradient path):
            (pa, pb, face normals, owning solid's center) in the shared
            4R+12B row layout — built once, indexed by BOTH the curved-
            mirror and the glass segment families."""
            pa_parts, pb_parts, n_parts, cen3_parts = [], [], [], []
            if R > 0:
                pa_parts.append(rc.reshape(-1, 3))
                pb_parts.append(jnp.roll(rc, -1, axis=1).reshape(-1, 3))
                n_parts.append(jnp.zeros((R * 4, 2, 3), jnp.float32))
                cen3_parts.append(jnp.repeat(rc.mean(1), 4, axis=0))
            if B > 0:
                pa_parts.append(bc[:, _BOX_EA].reshape(-1, 3))
                pb_parts.append(bc[:, _BOX_EB].reshape(-1, 3))
                n_parts.append(bn.reshape(-1, 2, 3))
                cen3_parts.append(jnp.repeat(bc.mean(1), 12, axis=0))
            return (jnp.concatenate(pa_parts),
                    jnp.concatenate(pb_parts),
                    jnp.concatenate(n_parts),
                    jnp.concatenate(cen3_parts))

        seg_bank = _seg_bank() if (Q2 > 0 or GQ2 > 0) else None

        if Q2 > 0:
            # Rect/box boundary segments seen in CURVED mirrors: one
            # Alhazen chief solve per sample (_curved_mirror_point_xy).
            pa_b = seg_bank[0][cms_sel]  # [Q2,3]
            pb_b = seg_bank[1][cms_sel]
            n12b = seg_bank[2][cms_sel]  # [Q2,2,3]
            cen3 = seg_bank[3][cms_sel]
            mq2 = geom.p0[cms_m]
            Rq2 = jnp.abs(geom.radius[cms_m])
            u = jnp.asarray(us)
            offq2 = _lens_offsets(jnp.asarray(disk_q2))  # [Q2,E2,3]
            xy, okc, xrf = cms_xy_fn(offq2, mq2, Rq2, pa_b, pb_b, u,
                                     basis)
            tau = cms_tan_fn(offq2, mq2, Rq2, pa_b, pb_b, u, basis) \
                * (1.0 / E2)
            # Box silhouette-edge test from the per-sample REFLECTION
            # point (the viewpoint the real geometry is seen from).
            is_box = (n12b * n12b).sum((-1, -2)) > 0.0
            x_p = (sg(pa_b)[:, None, :]
                   + u[None, :, None] * (sg(pb_b) - sg(pa_b))[:, None, :])
            v = x_p - sg(xrf)
            d1 = (n12b[:, None, 0, :] * v).sum(-1)
            d2 = (n12b[:, None, 1, :] * v).sum(-1)
            okc = okc & jnp.where(is_box[:, None], (d1 * d2) < 0.0, True)
            okc3 = okc[..., None]
            xy = jnp.where(okc3, xy, 0.0)  # sanitize diverged lanes
            tau = jnp.where(sg(okc3), sg(tau), 1.0)
            # Orientation anchor: the mirrored image of the solid's
            # center; masked sample centroid as fallback when that solve
            # itself diverges.
            cen_xy, cen_ok = cmp_cen_fn(mq2, Rq2, sg(cen3), basis)
            wsum = jnp.maximum(sg(okc3).sum(1, keepdims=True), 1)
            cen_fb = sg(xy).sum(1, keepdims=True) / wsum
            cen = jnp.where(sg(cen_ok)[:, None, None], sg(cen_xy)[:, None],
                            cen_fb)
            parts.append(_finish_part(xy, tau, cen, okc))
            mid = basis.time0 + 0.5 * (basis.time1 - basis.time0)
            times.append(jnp.full((Q2 * E2,), mid, jnp.float32))
            offsets.append(offq2.reshape(-1, 3))

        if GQ2 > 0:
            # Rect/box boundary segments seen THROUGH glass spheres: one
            # refracted chief solve per sample (_glass_point_xy), the
            # refractive analogue of the Q2 family above (same bank).
            pa_b = seg_bank[0][gls_sel]  # [GQ2,3]
            pb_b = seg_bank[1][gls_sel]
            n12b = seg_bank[2][gls_sel]  # [GQ2,2,3]
            cen3 = seg_bank[3][gls_sel]
            gg2 = geom.p0[gls_g]
            Rg2 = jnp.abs(geom.radius[gls_g])
            iorg2 = arrays.materials.ior[geom.material[gls_g]]
            u = jnp.asarray(us)
            offg2 = _lens_offsets(jnp.asarray(disk_g2))  # [GQ2,E2,3]
            xy, okgl, xex = gls_xy_fn(offg2, gg2, Rg2, iorg2, pa_b, pb_b,
                                      u, basis)
            tau = gls_tan_fn(offg2, gg2, Rg2, iorg2, pa_b, pb_b, u,
                             basis) * (1.0 / E2)
            # Box silhouette-edge test from the per-sample EXIT point
            # (the viewpoint the real geometry is seen from).
            is_box = (n12b * n12b).sum((-1, -2)) > 0.0
            x_p = (sg(pa_b)[:, None, :]
                   + u[None, :, None] * (sg(pb_b) - sg(pa_b))[:, None, :])
            v = x_p - sg(xex)
            d1 = (n12b[:, None, 0, :] * v).sum(-1)
            d2 = (n12b[:, None, 1, :] * v).sum(-1)
            okgl = okgl & jnp.where(is_box[:, None], (d1 * d2) < 0.0, True)
            okgl3 = okgl[..., None]
            xy = jnp.where(okgl3, xy, 0.0)
            tau = jnp.where(sg(okgl3), sg(tau), 1.0)
            cen_xy, cen_ok = glp_cen_fn(gg2, Rg2, iorg2, sg(cen3), basis)
            wsum = jnp.maximum(sg(okgl3).sum(1, keepdims=True), 1)
            cen_fb = sg(xy).sum(1, keepdims=True) / wsum
            cen = jnp.where(sg(cen_ok)[:, None, None], sg(cen_xy)[:, None],
                            cen_fb)
            parts.append(_finish_part(xy, tau, cen, okgl))
            mid = basis.time0 + 0.5 * (basis.time1 - basis.time0)
            times.append(jnp.full((GQ2 * E2,), mid, jnp.float32))
            offsets.append(offg2.reshape(-1, 3))

        flat_xy = jnp.concatenate([p[0] for p in parts])
        flat_xy_p = jnp.concatenate([p[1] for p in parts])
        flat_n = jnp.concatenate([p[2] for p in parts])
        wgt = jnp.concatenate([p[3] for p in parts])
        pix = jnp.concatenate([p[4] for p in parts])
        flat_t = sg(jnp.concatenate(times))
        flat_off = sg(jnp.concatenate(offsets))

        # Radiance difference across the edge (one probe batch for every
        # curve family).
        L_in = _probe_radiance(arrays, bvh, basis,
                               flat_xy_p - np.float32(eps) * flat_n,
                               flat_t, flat_off, seed)
        L_out = _probe_radiance(arrays, bvh, basis,
                                flat_xy_p + np.float32(eps) * flat_n,
                                flat_t, flat_off, seed)
        w = sg(L_in - L_out) * wgt[:, None]

        # Straight-through: primal == 0, tangent == sum_k w_k (n_k . dxy_k).
        drift = ((flat_xy - flat_xy_p) * flat_n).sum(-1)
        img = jnp.zeros((W * H, 3), jnp.float32)
        img = img.at[pix].add(w * drift[:, None])
        return img

    return correction
