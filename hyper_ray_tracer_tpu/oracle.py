"""Scalar NumPy oracle renderer.

An *independent*, deliberately slow, per-pixel recursive implementation of
the reference integrator (`/root/reference/src/application.rs:477-495`) with
a linear closest-hit scan (list.rs:20-31 semantics) — no BVH, no
vectorisation, no masking.  Control flow is plain Python if/else mirroring
the Rust, so it cross-checks everything the wavefront renderer does
differently: flattened BVH traversal, masked all-compute shading, the
scan-based bounce loop, and scene SoA flattening.

It shares with the production renderer only:
* the counter-based RNG spec (ops/rng.py) — required, or samples could not
  line up draw-for-draw;
* the Perlin tables and camera basis (pure data).

Everything else (intersection math, scatter logic, textures) is re-derived
here from the reference sources cited inline.
"""

from __future__ import annotations

import numpy as np

from .camera import CameraBasis, make_basis
from .models.scene import (
    MT_DIELECTRIC,
    MT_DIFFUSE_LIGHT,
    MT_ISOTROPIC,
    MT_LAMBERTIAN,
    MT_METAL,
    PT_BOX,
    PT_MEDIUM_BOX,
    PT_MEDIUM_SPHERE,
    PT_NONE,
    PT_RECT,
    PT_SPHERE,
    TT_CHECKER,
    TT_IMAGE,
    TT_NOISE,
    TT_SOLID,
    Scene,
)
from .ops import perlin
from .ops import rng as prng

F = np.float32


def _unit(v):
    return v / np.sqrt(float(v @ v))


def _unit_vector(u1, u2):
    z = 1.0 - 2.0 * u1
    r = np.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u2
    return np.array([r * np.cos(phi), r * np.sin(phi), z], F)


def _in_unit_sphere(u1, u2, u3):
    return _unit_vector(u1, u2) * np.cbrt(u3)


class Oracle:
    def __init__(self, scene: Scene, width: int, height: int):
        self.scene = scene
        self.arrays = scene.arrays
        self.static = scene.static
        self.width = width
        self.height = height
        self.basis: CameraBasis = make_basis(scene.camera, width, height)
        g = self.arrays.geom
        self.n = scene.static.n_prims
        self.geom = g

    # ---- intersection (reference semantics, scalar) ----------------------
    def _hit_prim(self, i, o, d, time, t_min, t_max, bounce_bits):
        g = self.geom
        pt = int(g.ptype[i])
        if pt == PT_NONE:
            return None
        rot = g.rot[i]
        if self.static.has_ray_xform:
            o = rot.T @ (o - g.trans[i])
            d = rot.T @ d

        if pt == PT_SPHERE:
            # sphere.rs:40-75 / moving_sphere.rs:53-95
            c0, c1 = g.p0[i], g.p1[i]
            if self.static.has_motion:
                frac = (time - g.time0[i]) / (g.time1[i] - g.time0[i])
                center = c0 + frac * (c1 - c0)
            else:
                center = c0
            r = float(g.radius[i])
            oc = o - center
            a = float(d @ d)
            half_b = float(oc @ d)
            c = float(oc @ oc) - r * r
            disc = half_b * half_b - a * c
            if disc < 0.0:
                return None
            sq = np.sqrt(disc)
            root = (-half_b - sq) / a
            if root < t_min or t_max < root:
                root = (-half_b + sq) / a
                if root < t_min or t_max < root:
                    return None
            return float(root)

        if pt == PT_RECT:
            # rect.rs:53-86
            axis = int(g.axis[i])
            perm = {0: (2, 0, 1), 1: (0, 1, 2), 2: (1, 2, 0)}[axis]
            ka, aa, ba = perm
            a0, b0, k = g.p0[i]
            a1, b1, _ = g.p1[i]
            if d[ka] == 0.0:
                return None
            t = (k - o[ka]) / d[ka]
            if t < t_min or t > t_max:
                return None
            a = o[aa] + t * d[aa]
            b = o[ba] + t * d[ba]
            if a < a0 or a > a1 or b < b0 or b > b1:
                return None
            return float(t)

        if pt == PT_BOX:
            # cuboid.rs:31-88 as one slab interval (ops/intersect.py box_t:
            # the closest in-range interval endpoint IS the closest valid
            # face-rect hit of the reference's 6-rect List scan).
            d_safe = np.where(np.abs(d) < 1e-20, 1e-20, d)
            inv = 1.0 / d_safe
            t_lo = (g.p0[i] - o) * inv
            t_hi = (g.p1[i] - o) * inv
            t_entry = float(np.minimum(t_lo, t_hi).max())
            t_exit = float(np.maximum(t_lo, t_hi).min())
            if not (t_exit > t_entry):
                return None
            if t_min <= t_entry <= t_max:
                return t_entry
            if t_min <= t_exit <= t_max:
                return t_exit
            return None

        # constant_medium.rs:34-76
        if pt == PT_MEDIUM_SPHERE:
            center, r = g.p0[i], float(g.radius[i])
            oc = o - center
            a = float(d @ d)
            half_b = float(oc @ d)
            c = float(oc @ oc) - r * r
            disc = half_b * half_b - a * c
            if disc < 0.0:
                return None
            sq = np.sqrt(disc)
            t_entry = (-half_b - sq) / a
            t_exit = (-half_b + sq) / a
        elif pt == PT_MEDIUM_BOX:
            # Same tiny-magnitude floor as the renderer's medium_box_t
            # (ops/intersect.py) so an axis-parallel ray whose origin lies
            # exactly on a slab plane follows one shared convention
            # (raw 1/d would make 0*inf = NaN here and a guaranteed miss).
            d_safe = np.where(np.abs(d) < 1e-20, 1e-20, d)
            inv = 1.0 / d_safe
            t_lo = (g.p0[i] - o) * inv
            t_hi = (g.p1[i] - o) * inv
            t_entry = float(np.minimum(t_lo, t_hi).max())
            t_exit = float(np.maximum(t_lo, t_hi).min())
            if not (t_exit > t_entry):
                return None
        else:
            return None

        if t_exit < t_entry + 1.0e-4:  # boundary re-hit epsilon
            return None
        t1 = max(t_entry, t_min)
        t2 = min(t_exit, t_max)
        if t1 >= t2:
            return None
        t1 = max(t1, 0.0)
        ray_len = float(np.sqrt(d @ d))
        dist_inside = (t2 - t1) * ray_len
        u = float(prng.bits_to_uniform(
            prng.stream_bits(bounce_bits, prng.P_MEDIUM,
                             np.uint32(int(g.stable_id[i])))
        ))
        hit_dist = float(g.neg_inv_density[i]) * np.log(u) if u > 0 else np.inf
        if hit_dist > dist_inside:
            return None
        return float(t1 + hit_dist / ray_len)

    def _hit_world(self, o, d, time, t_min, t_max, bounce_bits):
        """Linear closest-hit scan (list.rs:20-31)."""
        closest = t_max
        best = -1
        for i in range(self.n):
            t = self._hit_prim(i, o, d, time, t_min, closest, bounce_bits)
            if t is not None:
                closest = t
                best = i
        if best < 0:
            return None
        return closest, best

    def _hit_detail(self, i, o, d, time, t):
        g = self.geom
        pt = int(g.ptype[i])
        point = o + t * d
        if pt == PT_SPHERE:
            if self.static.has_motion:
                frac = (time - g.time0[i]) / (g.time1[i] - g.time0[i])
                center = g.p0[i] + frac * (g.p1[i] - g.p0[i])
            else:
                center = g.p0[i]
            outward = (point - center) / float(g.radius[i])
            theta = np.arccos(np.clip(-outward[1], -(1.0 - 1e-7), 1.0 - 1e-7))
            ox = 1e-20 if (outward[0] == 0.0 and outward[2] == 0.0) else outward[0]
            phi = np.arctan2(-outward[2], ox) + np.pi
            u, v = phi / (2 * np.pi), theta / np.pi
        elif pt == PT_RECT:
            rot = g.rot[i]
            o_obj, d_obj = o, d
            if self.static.has_ray_xform:
                o_obj = rot.T @ (o - g.trans[i])
                d_obj = rot.T @ d
            axis = int(g.axis[i])
            perm = {0: (2, 0, 1), 1: (0, 1, 2), 2: (1, 2, 0)}[axis]
            ka, aa, ba = perm
            a0, b0, _k = g.p0[i]
            a1, b1, _ = g.p1[i]
            a = o_obj[aa] + t * d_obj[aa]
            b = o_obj[ba] + t * d_obj[ba]
            u = (a - a0) / (a1 - a0)
            v = (b - b0) / (b1 - b0)
            outward = np.zeros(3, F)
            outward[ka] = 1.0
            if self.static.has_ray_xform:
                outward = rot @ outward
        elif pt == PT_BOX:
            # Face recovery + rect-convention outward/uv; mirrors the
            # renderer's box branch in ops/intersect.py make_hit_detailer.
            rot = g.rot[i]
            o_obj, d_obj = o, d
            if self.static.has_ray_xform:
                o_obj = rot.T @ (o - g.trans[i])
                d_obj = rot.T @ d
            point_obj = o_obj + t * d_obj
            d_safe = np.where(np.abs(d_obj) < 1e-20, 1e-20, d_obj)
            inv = 1.0 / d_safe
            t_lo = (g.p0[i] - o_obj) * inv
            t_hi = (g.p1[i] - o_obj) * inv
            cand = np.concatenate(
                [np.minimum(t_lo, t_hi), np.maximum(t_lo, t_hi)])
            ax = int(np.argmin(np.abs(cand - t))) % 3
            outward = np.zeros(3, F)
            outward[ax] = 1.0  # rect.rs:81-83 two-sided +e_k convention
            span = np.where(g.p1[i] > g.p0[i], g.p1[i] - g.p0[i], 1.0)
            rel = (point_obj - g.p0[i]) / span
            # z-faces -> (x,y); y-faces -> (z,x); x-faces -> (y,z)
            u = float(rel[{0: 1, 1: 2, 2: 0}[ax]])
            v = float(rel[{0: 2, 1: 0, 2: 1}[ax]])
            if self.static.has_ray_xform:
                outward = rot @ outward
        else:  # media: zero normal, uv = 0 (constant_medium.rs:67-75)
            return point, np.zeros(3, F), False, 0.0, 0.0
        front = float(d @ outward) < 0.0
        normal = outward if front else -outward
        return point, normal.astype(F), front, float(u), float(v)

    # ---- appearance ------------------------------------------------------
    def _texture(self, tex_id, u, v, p):
        tx = self.arrays.textures
        tt = int(tx.ttype[tex_id])
        if tt == TT_SOLID:
            return tx.color1[tex_id].copy()
        if tt == TT_CHECKER:  # checker_texture.rs:22-30
            sines = np.sin(10.0 * p[0]) * np.sin(10.0 * p[1]) * np.sin(10.0 * p[2])
            return (tx.color1[tex_id] if sines < 0 else tx.color2[tex_id]).copy()
        if tt == TT_NOISE:  # noise_texture.rs:25-31
            scale = float(tx.scale[tex_id])
            sp = (scale * p).astype(F)
            turb = float(perlin.turbulence(self.arrays.perlin, sp, np))
            val = 0.5 * (1.0 + np.sin(scale * p[2] + 10.0 * turb))
            return np.full(3, val, F)
        if tt == TT_IMAGE:  # image_texture.rs:36-62
            img_id = int(tx.image_id[tex_id])
            w, h = (int(x) for x in self.arrays.image_wh[img_id])
            uu = min(max(u, 0.0), 1.0)
            vv = 1.0 - min(max(v, 0.0), 1.0)
            i = min(int(uu * w), w - 1)
            j = min(int(vv * h), h - 1)
            return self.arrays.images[img_id, j, i].copy()
        raise ValueError(tt)

    def _scatter(self, mat_id, d, point, normal, front, u, v, bb):
        """Returns (emitted, attenuation_or_None, scattered_dir)."""
        m = self.arrays.materials
        mt = int(m.mtype[mat_id])
        emitted = np.zeros(3, F)
        if mt == MT_DIFFUSE_LIGHT:  # diffuse_light.rs:21-27
            emitted = self._texture(int(m.texture[mat_id]), u, v, point)
            return emitted, None, None
        if mt == MT_LAMBERTIAN:  # lambertian.rs:27-38
            u1 = float(prng.uniform(bb, prng.P_LAMBERT_A))
            u2 = float(prng.uniform(bb, prng.P_LAMBERT_B))
            sdir = normal + _unit_vector(u1, u2)
            if np.all(np.abs(sdir) < 1e-8):
                sdir = normal
            att = self._texture(int(m.texture[mat_id]), u, v, point)
            return emitted, att, sdir
        if mt == MT_METAL:  # metal.rs:29-42
            s1 = float(prng.uniform(bb, prng.P_SPHERE_A))
            s2 = float(prng.uniform(bb, prng.P_SPHERE_B))
            s3 = float(prng.uniform(bb, prng.P_SPHERE_C))
            ud = _unit(d)
            reflected = ud - 2.0 * float(ud @ normal) * normal
            sdir = reflected + float(m.fuzz[mat_id]) * _in_unit_sphere(s1, s2, s3)
            if float(sdir @ normal) > 0.0:
                return emitted, m.albedo[mat_id].copy(), sdir
            return emitted, None, None
        if mt == MT_DIELECTRIC:  # dielectric.rs:31-55
            ior = float(m.ior[mat_id])
            ratio = 1.0 / ior if front else ior
            ud = _unit(d)
            cos_t = min(float(-ud @ normal), 1.0)
            sin_t = np.sqrt(max(0.0, 1.0 - cos_t * cos_t))
            r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
            schlick = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
            uu = float(prng.uniform(bb, prng.P_DIELECTRIC))
            if ratio * sin_t > 1.0 or schlick > uu:
                sdir = ud - 2.0 * float(ud @ normal) * normal
            else:
                perp = ratio * (ud + cos_t * normal)
                par = -np.sqrt(abs(1.0 - float(perp @ perp))) * normal
                sdir = perp + par
            return emitted, np.ones(3, F), sdir
        if mt == MT_ISOTROPIC:  # isotropic.rs:27-33
            s1 = float(prng.uniform(bb, prng.P_SPHERE_A))
            s2 = float(prng.uniform(bb, prng.P_SPHERE_B))
            s3 = float(prng.uniform(bb, prng.P_SPHERE_C))
            att = self._texture(int(m.texture[mat_id]), u, v, point)
            return emitted, att, _in_unit_sphere(s1, s2, s3)
        raise ValueError(mt)

    # ---- integrator (application.rs:477-495) -----------------------------
    def ray_color(self, o, d, time, base, bounce, depth):
        if depth == 0:
            return np.zeros(3, F)
        bb = prng.bounce_base(base, np.uint32(bounce))
        hit = self._hit_world(o, d, time, 1.0e-3, 3.0e38, bb)
        if hit is None:
            if self.scene.background is None:  # gradient sky (bench scenes)
                ud = _unit(d)
                t = 0.5 * (ud[1] + 1.0)
                return ((1 - t) * np.ones(3, F)
                        + t * np.array([0.5, 0.7, 1.0], F)).astype(F)
            return np.asarray(self.scene.background, F)
        t, i = hit
        point, normal, front, u, v = self._hit_detail(i, o, d, time, t)
        mat_id = int(self.geom.material[i])
        emitted, att, sdir = self._scatter(
            mat_id, d, point, normal, front, u, v, bb
        )
        if att is None:
            return emitted
        rec = self.ray_color(point, sdir, time, base, bounce + 1, depth - 1)
        return (att * rec + emitted).astype(F)

    def render(self, samples: int, depth: int, seed: int = 0) -> np.ndarray:
        """Returns [H,W,3] gamma-corrected, rows top-down (same layout as
        render.render_image)."""
        W, H = self.width, self.height
        img = np.zeros((H, W, 3), np.float64)
        b = self.basis
        for py in range(H):
            for px in range(W):
                pixel_id = np.uint32(py * W + px)
                acc = np.zeros(3, np.float64)
                for s_i in range(samples):
                    base = prng.ray_base(np.uint32(seed), pixel_id,
                                         np.uint32(s_i))
                    ju = float(prng.uniform(base, prng.P_CAM_JITTER_U))
                    jv = float(prng.uniform(base, prng.P_CAM_JITTER_V))
                    s = (px + ju) / (W - 1)
                    t = (py + jv) / (H - 1)
                    u1 = float(prng.uniform(base, prng.P_LENS_U))
                    u2 = float(prng.uniform(base, prng.P_LENS_V))
                    r = np.sqrt(u1)
                    phi = 2.0 * np.pi * u2
                    rd = float(b.lens_radius) * np.array(
                        [r * np.cos(phi), r * np.sin(phi)], F
                    )
                    offset = rd[0] * b.u + rd[1] * b.v
                    o = b.origin + offset
                    d = (b.lower_left + s * b.horizontal + t * b.vertical
                         - b.origin - offset).astype(F)
                    ut = float(prng.uniform(base, prng.P_TIME))
                    time = float(b.time0 + ut * (b.time1 - b.time0))
                    acc += self.ray_color(o.astype(F), d, time, base, 0, depth)
                img[py, px] = np.sqrt(np.maximum(acc / samples, 0.0))
        return img[::-1].astype(np.float32)
