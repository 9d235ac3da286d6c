"""Thin-lens look-at camera, matching `/root/reference/src/camera.rs`.

The basis construction (`resize``, camera.rs:67-83) runs host-side in NumPy;
``get_rays`` is xp-generic and fully vectorised: it turns per-sample uniforms
into jittered, defocused, shutter-timed rays.  Ray directions are
*unnormalised*, exactly like the reference (ray.rs stores origin + direction
as-is and every consumer handles non-unit directions).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .models.scene import CameraConfig
from .ops import math as m
from .ops import rng as prng


class CameraBasis(NamedTuple):
    """Pytree of the resolved camera frame (camera.rs:20-33)."""

    origin: np.ndarray  # [3]
    lower_left: np.ndarray  # [3]
    horizontal: np.ndarray  # [3]
    vertical: np.ndarray  # [3]
    u: np.ndarray  # [3]
    v: np.ndarray  # [3]
    lens_radius: np.ndarray  # [] = aperture / 2 (camera.rs:57)
    time0: np.ndarray  # []
    time1: np.ndarray  # []


def make_basis(cfg: CameraConfig, width: int, height: int) -> CameraBasis:
    """camera.rs:67-83 (``resize``)."""
    aspect = np.float32(width) / np.float32(height)
    theta = np.deg2rad(np.float32(cfg.fov))
    h = np.tan(theta / 2.0)
    viewport_h = 2.0 * h
    viewport_w = aspect * viewport_h

    look_from = np.asarray(cfg.look_from, np.float32)
    look_at = np.asarray(cfg.look_at, np.float32)
    w = look_from - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(np.float32([0.0, 1.0, 0.0]), w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)

    horizontal = np.float32(cfg.focus_dist * viewport_w) * u
    vertical = np.float32(cfg.focus_dist * viewport_h) * v
    lower_left = (
        look_from - horizontal / 2.0 - vertical / 2.0
        - np.float32(cfg.focus_dist) * w
    )
    return CameraBasis(
        origin=look_from.astype(np.float32),
        lower_left=lower_left.astype(np.float32),
        horizontal=horizontal.astype(np.float32),
        vertical=vertical.astype(np.float32),
        u=u.astype(np.float32),
        v=v.astype(np.float32),
        lens_radius=np.float32(cfg.aperture / 2.0),
        time0=np.float32(cfg.time0),
        time1=np.float32(cfg.time1),
    )


def get_rays(basis: CameraBasis, base, s, t, xp):
    """Generate camera rays (camera.rs:85-95).

    ``base``: per-(pixel, sample) RNG base hashes (uint32, any shape B).
    ``s``, ``t``: viewport coordinates in [0,1] including the pixel jitter
    (the jitter itself is applied by the caller so the oracle and renderer
    share the exact formula ``(x + u) / (W-1)``, application.rs:443-446).

    Returns (origin [B,3], direction [B,3], time [B]).
    """
    u1 = prng.uniform(base, prng.P_LENS_U)
    u2 = prng.uniform(base, prng.P_LENS_V)
    rd = basis.lens_radius * m.in_unit_disk_from_uniforms(u1, u2, xp)  # [B,2]
    offset = rd[..., 0:1] * basis.u + rd[..., 1:2] * basis.v  # [B,3]

    origin = basis.origin + offset
    direction = (
        basis.lower_left
        + s[..., None] * basis.horizontal
        + t[..., None] * basis.vertical
        - basis.origin
        - offset
    )
    ut = prng.uniform(base, prng.P_TIME)
    time = basis.time0 + ut * (basis.time1 - basis.time0)
    return origin, direction, time
