"""Perlin gradient noise, matching `/root/reference/src/perlin_noise.rs`.

Parity-relevant reference quirks reproduced here:

* Three *independent* axis permutations, lattice hash
  ``perm_x[i] ^ perm_y[j] ^ perm_z[k]`` (perlin_noise.rs:44-64, 92-95).
* Gradient vectors are ``normalize(uniform(-1,1)^3)`` — cube-corner biased,
  NOT uniform-on-sphere (perlin_noise.rs:26-34).  We keep that distribution.
* The Hermite smoothing ``u*u*(3-2u)`` is applied FIRST and the *smoothed*
  u,v,w are used both in the lerp weights AND inside the dot-product weight
  vector ``(u-x, v-y, w-z)`` (perlin_noise.rs:104-123).  The Shirley book uses
  the raw fractional coordinates for the weight vector; we match the
  reference, not the book.
* ``turbulence(p, depth)`` = |sum_k 0.5^k * noise(2^k p)| (perlin_noise.rs:66-78).

The tables are generated host-side with a seeded NumPy generator (the
reference uses ``thread_rng``, which is irreproducible by design —
perlin_noise.rs:24,58); only the *distribution* of the tables matters for
look parity.

``noise``/``turbulence`` are xp-generic: they run on NumPy (scalar oracle) and
on jax.numpy (vectorised renderer) with identical results.  Gathers use fancy
indexing, which lowers to XLA gathers from 256-entry tables (VMEM-resident).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

POINT_COUNT = 256
TURBULENCE_DEPTH = 7  # textures/noise_texture.rs:28 passes depth=7


class PerlinTables(NamedTuple):
    """Pytree of the four lattice tables (float32 / int32)."""

    vectors: np.ndarray  # [256, 3] float32 unit-ish gradient vectors
    perm_x: np.ndarray  # [256] int32
    perm_y: np.ndarray  # [256] int32
    perm_z: np.ndarray  # [256] int32


def make_tables(seed: int = 0) -> PerlinTables:
    rng = np.random.default_rng(np.uint32(seed) ^ np.uint32(0x5E11A57))
    v = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True).astype(np.float32)
    perms = [
        rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)
    ]
    return PerlinTables(v.astype(np.float32), *perms)


def noise(tables: PerlinTables, point, xp):
    """Gradient noise at ``point`` (..., 3).  Returns (...) float32.

    Mirrors perlin_noise.rs:81-123 including the smoothed-weight-vector quirk.
    """
    pf = xp.floor(point)
    ijk = pf.astype(np.int32)
    uvw = point - pf  # fractional part, in [0,1)
    # Hermite smoothing FIRST (perlin_noise.rs:105-107).
    s = uvw * uvw * (3.0 - 2.0 * uvw)

    mask = np.int32(POINT_COUNT - 1)
    acc = None
    for dx in (0, 1):
        px = tables.perm_x[(ijk[..., 0] + dx) & mask]
        for dy in (0, 1):
            py = tables.perm_y[(ijk[..., 1] + dy) & mask]
            for dz in (0, 1):
                pz = tables.perm_z[(ijk[..., 2] + dz) & mask]
                g = tables.vectors[px ^ py ^ pz]  # (..., 3)
                # Smoothed weight vector (reference quirk).
                wv = xp.stack(
                    [s[..., 0] - dx, s[..., 1] - dy, s[..., 2] - dz], axis=-1
                )
                lerp_w = (
                    (dx * s[..., 0] + (1 - dx) * (1.0 - s[..., 0]))
                    * (dy * s[..., 1] + (1 - dy) * (1.0 - s[..., 1]))
                    * (dz * s[..., 2] + (1 - dz) * (1.0 - s[..., 2]))
                )
                term = lerp_w * (g * wv).sum(-1)
                acc = term if acc is None else acc + term
    return acc


def turbulence(tables: PerlinTables, point, xp, depth: int = TURBULENCE_DEPTH):
    """|sum_k 0.5^k noise(2^k p)|  (perlin_noise.rs:66-78)."""
    acc = None
    p = point
    weight = 1.0
    for _ in range(depth):
        term = weight * noise(tables, p, xp)
        acc = term if acc is None else acc + term
        weight *= 0.5
        p = p * 2.0
    return xp.abs(acc)
