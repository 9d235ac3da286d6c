"""Counter-based, stateless RNG shared by the JAX wavefront renderer and the
NumPy scalar oracle.

The reference (`/root/reference/src/math.rs:16-40`, `camera.rs:89`,
`application.rs:436`) uses `rand::thread_rng()` everywhere, which is
irreproducible by design.  A TPU-native SPMD renderer instead derives every
random draw from a pure function of *where it is used*:

    u = uniform(seed, pixel_id, sample_id, bounce, purpose[, salt])

so that a render is bit-identical across runs, device counts, shardings, and
between the vectorised JAX renderer and the scalar NumPy oracle.

The hash is a murmur3-style word mixer with an xxhash-style avalanche
finaliser.  It is cheap on the VPU (pure uint32 ops, no threefry tables, no
gathers) while having far more than enough quality for Monte-Carlo rendering.

Every function here works identically on `jnp` uint32 arrays and `np` uint32
scalars/arrays (both wrap mod 2**32).
"""

from __future__ import annotations

import numpy as np

# Stream / purpose identifiers.  These are part of the renderer's RNG *spec*:
# the oracle and the wavefront renderer must use the same constants so their
# sample streams line up draw-for-draw.
P_CAM_JITTER_U = 0x01
P_CAM_JITTER_V = 0x02
P_LENS_U = 0x03
P_LENS_V = 0x04
P_TIME = 0x05
# Per-bounce scatter streams.
P_LAMBERT_A = 0x10
P_LAMBERT_B = 0x11
P_SPHERE_A = 0x12  # random_in_unit_sphere (metal fuzz / isotropic): 3 draws
P_SPHERE_B = 0x13
P_SPHERE_C = 0x14
P_DIELECTRIC = 0x15
# Participating-media free-flight sampling; salted with the primitive id so
# overlapping media (e.g. the final scene's global fog + subsurface sphere,
# reference application.rs:866-895) draw independent distances.
P_MEDIUM = 0x20

_GOLDEN = np.uint32(0x9E3779B9)
_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_F1 = np.uint32(0x85EBCA6B)
_F2 = np.uint32(0xC2B2AE35)
_INV24 = np.float32(1.0 / (1 << 24))


def _u32(x):
    """Coerce ints / arrays to uint32 (wrapping).

    Python ints and NumPy scalars become 0-d uint32 *arrays*: NumPy 2 warns
    on scalar overflow but wraps 0-d arrays silently, and all our arithmetic
    relies on mod-2**32 wrapping.
    """
    if isinstance(x, (int, np.integer)):
        return np.asarray(x & 0xFFFFFFFF, np.uint32)
    return x.astype(np.uint32) if hasattr(x, "astype") else x


def _rotl(x, r: int):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def fmix32(h):
    """xxhash/murmur3 avalanche finaliser (uint32 in, uint32 out).

    Relies on mod-2**32 wrapping; the errstate guard silences NumPy's scalar
    overflow warning on the oracle's scalar path (no-op under JAX tracing).
    """
    h = _u32(h)
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint32(16))
        h = h * _F1
        h = h ^ (h >> np.uint32(13))
        h = h * _F2
        h = h ^ (h >> np.uint32(16))
    return h


def hash_words(seed, *words):
    """Combine uint32 words into one well-mixed uint32 (murmur3-style)."""
    with np.errstate(over="ignore"):
        h = _u32(seed) ^ np.uint32(0x9747B28C)
        for w in words:
            k = _u32(w) * _C1
            k = _rotl(k, 15)
            k = k * _C2
            h = h ^ k
            h = _rotl(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
    return fmix32(h)


def bits_to_uniform(bits):
    """uint32 bits -> float32 uniform in [0, 1) using the top 24 bits."""
    b = _u32(bits) >> np.uint32(8)
    return b.astype(np.float32) * _INV24


def ray_base(seed, pixel_id, sample_id):
    """Per-(pixel, sample) base hash; all camera + bounce draws derive from it."""
    return hash_words(seed, pixel_id, sample_id)


def stream_bits(base, purpose, salt=np.uint32(0)):
    """Derive one uint32 from a base hash, a purpose constant, and a salt."""
    with np.errstate(over="ignore"):
        mixed = _u32(base) + _u32(purpose) * _GOLDEN + _u32(salt) * _F1
    return fmix32(mixed)


def uniform(base, purpose, salt=np.uint32(0)):
    """float32 uniform in [0,1) for a named stream."""
    return bits_to_uniform(stream_bits(base, purpose, salt))


def bounce_base(base, bounce):
    """Fold the bounce index into a per-(pixel,sample) base hash."""
    with np.errstate(over="ignore"):
        mixed = _u32(base) + _u32(bounce) * _C2
    return fmix32(mixed)
