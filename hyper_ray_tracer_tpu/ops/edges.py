"""Edge-sampled silhouette gradients for sphere geometry.

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
and its tangent w.r.t. (geom.p0, geom.radius) is the boundary term — so
`image + correction` gives any downstream loss the full gradient by the
chain rule, with no custom VJP.

Occlusion needs no special casing: the inside/outside probe rays of an
occluded edge point both hit the occluder, so dL ~ 0 and the sample
cancels itself.

Scope (documented limitations): static spheres under a pinhole camera
(probe rays ignore the lens; scenes with aperture get an approximate
boundary term), primary visibility only — silhouettes seen through a
bounce (mirror images of edges) keep the fixed-decision convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import PT_SPHERE
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


def _edge_xy(c, r, phi, basis, W, H):
    """Image coordinates [2] of the silhouette point at angle ``phi``.

    Smooth in (c, r, phi); this is the ONLY function the boundary
    gradient differentiates through.
    """
    origin = basis.origin
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

    # Invert direction(s, t) = (s - 1/2) H + (t - 1/2) V - f w
    # (camera.rs:85-94 with zero lens offset).  H, V, fw are orthogonal.
    Hv, Vv = basis.horizontal, basis.vertical
    fw = basis.origin - basis.lower_left - 0.5 * Hv - 0.5 * Vv
    cH = (w_dir * Hv).sum() / (Hv * Hv).sum()
    cV = (w_dir * Vv).sum() / (Vv * Vv).sum()
    cW = (w_dir * fw).sum() / (fw * fw).sum()  # negative in front
    s = cH / (-cW) + 0.5
    t = cV / (-cW) + 0.5
    return jnp.stack([s * (W - 1), t * (H - 1)]), cW


def make_silhouette_correction(scene, W, H, depth, use_bvh, leaf_size=4,
                               sphere_ids=None, n_edge: int = 64,
                               n_probe: int = 2, eps: float = 0.35):
    """Build correction(arrays, bvh, basis, seed) -> [W*H, 3].

    Zero in the primal; its tangent w.r.t. arrays.geom.p0 / .radius is the
    edge-sampled silhouette boundary gradient of the EXPECTED image (the
    per-pixel mean radiance that render/train losses consume).

    ``sphere_ids``: which primitives get edge terms (default: every static
    sphere).  ``n_edge`` silhouette samples per sphere; ``n_probe``
    independent radiance probes per side; ``eps`` probe offset from the
    edge in pixels (bias O(eps); below ~0.2 the probes start landing on
    the wrong side of the curve at f32 precision).
    """
    from ..render import WavefrontState, make_ray_colorer

    if sphere_ids is None:
        sphere_ids = static_sphere_ids(scene)
    sphere_ids = np.asarray(sphere_ids, np.int32)
    S, E = int(sphere_ids.shape[0]), int(n_edge)
    colorer = make_ray_colorer(scene, W, H, depth, use_bvh, leaf_size,
                               differentiable=False)
    phis = (np.arange(E, dtype=np.float32) + 0.5) * (2.0 * np.pi / E)

    xy_fn = jax.vmap(jax.vmap(_edge_xy, in_axes=(None, None, 0, None,
                                                 None, None)),
                     in_axes=(0, 0, None, None, None, None))
    tan_fn = jax.vmap(jax.vmap(jax.jacfwd(lambda c, r, p, b:
                                          _edge_xy(c, r, p, b, W, H)[0],
                                          argnums=2),
                               in_axes=(None, None, 0, None)),
                      in_axes=(0, 0, None, None))

    def _probe_radiance(arrays, bvh, basis, xy, seed):
        """Trace pinhole rays through image points ``xy`` [M, 2] and
        return mean radiance over ``n_probe`` independent probes."""
        M = xy.shape[0]
        s = xy[:, 0] / np.float32(W - 1)
        t = xy[:, 1] / np.float32(H - 1)
        o = jnp.broadcast_to(basis.origin, (M, 3))
        d = (basis.lower_left + s[:, None] * basis.horizontal
             + t[:, None] * basis.vertical - basis.origin)
        out = jnp.zeros((M, 3), jnp.float32)
        for p in range(n_probe):
            base = prng.ray_base(seed ^ np.uint32(0x51E77E00 + p),
                                 jnp.arange(M, dtype=jnp.uint32),
                                 jnp.full((M,), p, jnp.uint32))
            time = basis.time0 + 0.5 * (basis.time1 - basis.time0)
            zero3 = o * 0.0
            st = WavefrontState(
                o=o, d=d, time=zero3[:, 0] + time, base=base,
                alive=zero3[:, 0] + 1.0 > 0.0, throughput=zero3 + 1.0,
                radiance=zero3,
            )
            st = colorer.bounce_scan(arrays, bvh, st, jnp.uint32(0), depth)
            out = out + st.radiance
        return out / np.float32(n_probe)

    def correction(arrays, bvh, basis, seed):
        geom = arrays.geom
        c = geom.p0[sphere_ids]  # [S,3] traced (gradient path)
        r = geom.radius[sphere_ids]  # [S]
        phi = jnp.asarray(phis)

        xy, cW = xy_fn(c, r, phi, basis, W, H)  # [S,E,2], [S,E]
        tau = tan_fn(c, r, phi, basis)  # [S,E,2] d xy / d phi

        sg = jax.lax.stop_gradient
        xy_p = sg(xy)
        tau_p = sg(tau)
        tau_len = jnp.sqrt((tau_p * tau_p).sum(-1) + 1e-20)
        nrm = jnp.stack([tau_p[..., 1], -tau_p[..., 0]], -1) / (
            tau_len[..., None])
        # Point the normal AWAY from the projected sphere center.
        center_px = sg(xy_p.mean(1, keepdims=True))
        flip = ((nrm * (xy_p - center_px)).sum(-1) < 0.0)
        nrm = jnp.where(flip[..., None], -nrm, nrm)

        # Validity: in front of the camera, camera outside the sphere,
        # and landing inside the image.
        L_cam = jnp.sqrt(((sg(c) - basis.origin) ** 2).sum(-1))
        valid = (sg(cW) < 0.0) & (L_cam > sg(r) * 1.001)[:, None]
        ix = jnp.floor(xy_p[..., 0]).astype(jnp.int32)
        iy = jnp.floor(xy_p[..., 1]).astype(jnp.int32)
        inside_img = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
        valid = valid & inside_img
        pix = (jnp.clip(iy, 0, H - 1) * W
               + jnp.clip(ix, 0, W - 1)).reshape(-1)

        # Radiance difference across the edge.
        flat_xy = xy_p.reshape(-1, 2)
        flat_n = nrm.reshape(-1, 2)
        L_in = _probe_radiance(arrays, bvh, basis,
                               flat_xy - np.float32(eps) * flat_n, seed)
        L_out = _probe_radiance(arrays, bvh, basis,
                                flat_xy + np.float32(eps) * flat_n, seed)
        dL = sg(L_in - L_out)  # [S*E, 3]

        dl = (tau_len * (_TWO_PI / E)).reshape(-1)  # edge length per sample
        w = dL * (dl * valid.reshape(-1).astype(jnp.float32))[:, None]

        # Straight-through: primal == 0, tangent == sum_k w_k (n_k . dxy_k).
        drift = ((xy - sg(xy)).reshape(-1, 2) * flat_n).sum(-1)  # [S*E]
        img = jnp.zeros((W * H, 3), jnp.float32)
        img = img.at[pix].add(w * drift[:, None])
        return img

    return correction
