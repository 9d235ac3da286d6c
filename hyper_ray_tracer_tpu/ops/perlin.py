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

TPU-native design: the reference drives its lattice with *materialised*
permutation tables filled by ``thread_rng`` (irreproducible by design —
perlin_noise.rs:24,58), so only the table *distribution* matters for look
parity.  Table lookups are gathers, and per-element gathers are the slowest
access pattern on a vector machine (measured ~35 ms per 90k-ray turbulence
evaluation on TPU v5e — the single largest shading cost).  We therefore
define the permutations and gradient vectors as **bijective 8-bit hash
functions** (seed-keyed add/xor/shift rounds — every step invertible, so
each axis map is a true permutation of 0..255; no 32-bit integer
multiplies, the slow VPU op) and ARX-hash gradients:

* ``make_tables(seed)`` materialises the hash functions into the classic
  table form, used by the scalar ``noise()`` (oracle, unit tests).
* ``turbulence()`` — the renderer's hot path — evaluates the *same* hash
  functions inline on the whole wavefront: pure VPU integer math, zero
  gathers, bit-identical to the table-based path by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

POINT_COUNT = 256
TURBULENCE_DEPTH = 7  # textures/noise_texture.rs:28 passes depth=7

_U32 = np.uint32
_MASK8 = np.int32(POINT_COUNT - 1)


def _mix32(h):
    """Avalanche mixer on uint32 built from adds/xors/shifts only.

    32-bit integer multiplies are the slow op on the TPU VPU (measured:
    they dominated the murmur-based turbulence); xorshift rounds with a
    golden-ratio add run at full vector rate.  Quality only needs to spread
    8 bits of lattice entropy over the uniform bits — far below a
    general-purpose hash bar.
    """
    with np.errstate(over="ignore"):  # uint32 wraparound is the algorithm
        h = h ^ (h >> _U32(16))
        h = h + _U32(0x9E37_79B9)
        h = h ^ (h << _U32(13))
        h = h ^ (h >> _U32(17))
        h = h ^ (h << _U32(5))
        h = h ^ (h >> _U32(16))
    return h


def _perm8(x, k1, k2):
    """Seed-keyed bijection on 0..255 (inputs uint32 in-range).

    Every round is invertible on 8 bits: xor/add constants, shift-add
    multiplication by odd 9/5/3 (x + (x<<k) mod 256 — no integer multiply
    instruction), and x ^= x >> k (triangular).  Composition is therefore a
    permutation.
    """
    m8 = _U32(0xFF)
    x = (x ^ k1) & m8
    x = (x + (x << _U32(3))) & m8  # * 9
    x = x ^ (x >> _U32(4))
    x = (x + k2) & m8
    x = (x + (x << _U32(2))) & m8  # * 5
    x = x ^ (x >> _U32(3))
    x = (x + (x << _U32(1))) & m8  # * 3
    x = x ^ (x >> _U32(2))
    return x


def _grad_xyz(h, gseed, xp):
    """Gradient components for lattice hash ``h`` as three separate
    arrays: normalize(uniform(-1,1)^3), the reference's cube-corner-biased
    distribution (perlin_noise.rs:26-34), with the three uniforms drawn
    from ARX hashes of (h, axis).  Component form (no trailing size-3
    axis) keeps every intermediate in the natural (sublane, lane) layout —
    required inside Pallas kernels, harmless under plain XLA."""
    with np.errstate(over="ignore"):
        h32 = h.astype(_U32)
        # Spread the 8 lattice bits across the word before mixing.
        h32 = h32 | (h32 << _U32(8)) | (h32 << _U32(16)) | (h32 << _U32(24))
        hh = h32 ^ gseed
    comps = []
    for salt in (_U32(0x68E3_1DA4), _U32(0xB529_7A4D), _U32(0x334D_4C65)):
        bits = _mix32(hh ^ salt)
        u = bits.astype(np.float32) * np.float32(2.0 ** -32)
        comps.append(2.0 * u - 1.0)
    gx, gy, gz = comps
    inv = 1.0 / xp.sqrt(xp.maximum(gx * gx + gy * gy + gz * gz, 1e-12))
    return gx * inv, gy * inv, gz * inv


def _grad(h, gseed, xp):
    """Stacked-form ``_grad_xyz`` ([..., 3]); kept for make_tables and the
    stacked turbulence path (values identical: the sum over a 3-long axis
    reduces left-to-right, exactly the component expression)."""
    gx, gy, gz = _grad_xyz(h, gseed, xp)
    return xp.stack([gx, gy, gz], axis=-1)


class PerlinKeys(NamedTuple):
    """Seed-derived hash keys (all uint32 scalars)."""

    kx1: np.ndarray
    kx2: np.ndarray
    ky1: np.ndarray
    ky2: np.ndarray
    kz1: np.ndarray
    kz2: np.ndarray
    gseed: np.ndarray


class PerlinTables(NamedTuple):
    """Pytree: hash keys + their materialised table form.

    ``vectors``/``perm_*`` are exactly ``_grad``/``_perm8`` evaluated on
    0..255 — the gather-based ``noise()`` (oracle, tests) and the computed
    ``turbulence()`` (renderer) agree by construction.
    """

    keys: PerlinKeys
    vectors: np.ndarray  # [256, 3] float32 gradient vectors
    perm_x: np.ndarray  # [256] int32
    perm_y: np.ndarray  # [256] int32
    perm_z: np.ndarray  # [256] int32


def make_keys(seed: int = 0) -> PerlinKeys:
    # 0-d arrays (not NumPy scalars): array uint32 arithmetic wraps silently.
    s = np.asarray(seed, _U32) ^ _U32(0x05E1_1A57)
    ks = [_mix32(s + np.asarray(i * 0x9E37_79B9 & 0xFFFF_FFFF, _U32))
          for i in range(7)]
    return PerlinKeys(
        kx1=ks[0] & _U32(0xFF), kx2=ks[1] & _U32(0xFF),
        ky1=ks[2] & _U32(0xFF), ky2=ks[3] & _U32(0xFF),
        kz1=ks[4] & _U32(0xFF), kz2=ks[5] & _U32(0xFF),
        gseed=ks[6],
    )


def make_tables(seed: int = 0) -> PerlinTables:
    keys = make_keys(seed)
    idx = np.arange(POINT_COUNT, dtype=_U32)
    return PerlinTables(
        keys=keys,
        vectors=np.asarray(_grad(idx, keys.gseed, np), np.float32),
        perm_x=_perm8(idx, keys.kx1, keys.kx2).astype(np.int32),
        perm_y=_perm8(idx, keys.ky1, keys.ky2).astype(np.int32),
        perm_z=_perm8(idx, keys.kz1, keys.kz2).astype(np.int32),
    )


def noise(tables: PerlinTables, point, xp):
    """Gradient noise at ``point`` (..., 3).  Returns (...) float32.

    Table-based scalar-oracle form, mirroring perlin_noise.rs:81-123
    including the smoothed-weight-vector quirk.  The renderer's wavefront
    path is ``turbulence`` below (identical values, computed hashes).
    """
    pf = xp.floor(point)
    ijk = pf.astype(np.int32)
    uvw = point - pf  # fractional part, in [0,1)
    # Hermite smoothing FIRST (perlin_noise.rs:105-107).
    s = uvw * uvw * (3.0 - 2.0 * uvw)

    acc = None
    for dx in (0, 1):
        px = tables.perm_x[(ijk[..., 0] + dx) & _MASK8]
        for dy in (0, 1):
            py = tables.perm_y[(ijk[..., 1] + dy) & _MASK8]
            for dz in (0, 1):
                pz = tables.perm_z[(ijk[..., 2] + dz) & _MASK8]
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


def turbulence(tables: PerlinTables, point, xp,
               depth: int = TURBULENCE_DEPTH):
    """|sum_k 0.5^k noise(2^k p)|  (perlin_noise.rs:66-78).

    Gather-free wavefront evaluation: all octaves' lattice coordinates are
    stacked on a new axis and the permutation / gradient values are computed
    with the seed-keyed hashes directly (see module docstring).  Corner and
    octave accumulation keep the reference's sequential order, so values
    match the table-based ``noise`` summation on the same backend.
    """
    keys = tables.keys
    scales = (2.0 ** np.arange(depth)).astype(np.float32)  # [depth]
    pts = point[..., None, :] * scales[:, None]  # [..., depth, 3]
    pf = xp.floor(pts)
    ijk = pf.astype(np.int32)
    uvw = pts - pf
    s = uvw * uvw * (3.0 - 2.0 * uvw)  # smoothed (perlin_noise.rs:105-107)

    def axis_perms(i, k1, k2):
        lo = ((i & _MASK8).astype(_U32))
        hi = (((i + 1) & _MASK8).astype(_U32))
        return _perm8(lo, k1, k2), _perm8(hi, k1, k2)

    px = axis_perms(ijk[..., 0], keys.kx1, keys.kx2)
    py = axis_perms(ijk[..., 1], keys.ky1, keys.ky2)
    pz = axis_perms(ijk[..., 2], keys.kz1, keys.kz2)

    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    noise_k = None
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                g = _grad(px[dx] ^ py[dy] ^ pz[dz], keys.gseed, xp)
                wv_dot = (
                    g[..., 0] * (sx - dx)
                    + g[..., 1] * (sy - dy)
                    + g[..., 2] * (sz - dz)
                )
                lerp_w = (
                    (dx * sx + (1 - dx) * (1.0 - sx))
                    * (dy * sy + (1 - dy) * (1.0 - sy))
                    * (dz * sz + (1 - dz) * (1.0 - sz))
                )
                term = lerp_w * wv_dot
                noise_k = term if noise_k is None else noise_k + term

    # Octave accumulation in sequential order (weight halves each octave).
    acc = None
    for k in range(depth):
        term = np.float32(0.5 ** k) * noise_k[..., k]
        acc = term if acc is None else acc + term
    return xp.abs(acc)


def _noise_xyz(keys: PerlinKeys, x, y, z, xp):
    """One-octave gradient noise on separate coordinate arrays.

    Per-lane math identical to one ``turbulence`` octave (same hash
    rounds, same corner order, same left-to-right reductions); component
    form so every intermediate keeps the input's 2-D layout — the shape
    Pallas TPU kernels require (no trailing size-3/size-depth axes)."""
    fx, fy, fz = xp.floor(x), xp.floor(y), xp.floor(z)
    ix = fx.astype(np.int32)
    iy = fy.astype(np.int32)
    iz = fz.astype(np.int32)
    ux, uy, uz = x - fx, y - fy, z - fz
    sx = ux * ux * (3.0 - 2.0 * ux)  # smoothed (perlin_noise.rs:105-107)
    sy = uy * uy * (3.0 - 2.0 * uy)
    sz = uz * uz * (3.0 - 2.0 * uz)

    def axis_perms(i, k1, k2):
        lo = (i & _MASK8).astype(_U32)
        hi = ((i + 1) & _MASK8).astype(_U32)
        return _perm8(lo, k1, k2), _perm8(hi, k1, k2)

    px = axis_perms(ix, keys.kx1, keys.kx2)
    py = axis_perms(iy, keys.ky1, keys.ky2)
    pz = axis_perms(iz, keys.kz1, keys.kz2)

    acc = None
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                gx, gy, gz = _grad_xyz(px[dx] ^ py[dy] ^ pz[dz],
                                       keys.gseed, xp)
                wv_dot = (gx * (sx - dx) + gy * (sy - dy)
                          + gz * (sz - dz))
                lerp_w = (
                    (dx * sx + (1 - dx) * (1.0 - sx))
                    * (dy * sy + (1 - dy) * (1.0 - sy))
                    * (dz * sz + (1 - dz) * (1.0 - sz))
                )
                term = lerp_w * wv_dot
                acc = term if acc is None else acc + term
    return acc


def turbulence_xyz(keys: PerlinKeys, x, y, z, xp,
                   depth: int = TURBULENCE_DEPTH):
    """``turbulence`` on separate coordinate arrays with the octave axis
    unrolled: per-lane values match ``turbulence`` exactly (same hash
    math, corner order, and octave accumulation order), but no
    [..., depth, 3] intermediates exist — the form a Pallas TPU kernel
    body can evaluate on (sublane, lane)-shaped blocks."""
    acc = None
    for k in range(depth):
        sc = np.float32(2.0 ** k)
        nk = _noise_xyz(keys, x * sc, y * sc, z * sc, xp)
        term = np.float32(0.5 ** k) * nk
        acc = term if acc is None else acc + term
    return xp.abs(acc)
