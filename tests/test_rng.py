"""Counter-based RNG: determinism, NumPy/JAX agreement, uniformity."""

import jax.numpy as jnp
import numpy as np

from hyper_ray_tracer_tpu.ops import rng as prng


def test_hash_deterministic():
    a = prng.hash_words(np.uint32(1), np.uint32(2), np.uint32(3))
    b = prng.hash_words(np.uint32(1), np.uint32(2), np.uint32(3))
    assert a == b
    c = prng.hash_words(np.uint32(1), np.uint32(2), np.uint32(4))
    assert a != c


def test_numpy_jax_agree():
    n = 4096
    pix = np.arange(n, dtype=np.uint32)
    sam = np.full(n, 7, np.uint32)
    base_np = prng.ray_base(np.uint32(42), pix, sam)
    base_j = prng.ray_base(np.uint32(42), jnp.asarray(pix), jnp.asarray(sam))
    np.testing.assert_array_equal(base_np, np.asarray(base_j))

    u_np = prng.uniform(base_np, prng.P_LAMBERT_A)
    u_j = prng.uniform(jnp.asarray(base_np), prng.P_LAMBERT_A)
    np.testing.assert_array_equal(u_np, np.asarray(u_j))


def test_uniform_range_and_moments():
    n = 200_000
    base = prng.ray_base(np.uint32(0), np.arange(n, dtype=np.uint32),
                         np.zeros(n, np.uint32))
    u = prng.uniform(base, prng.P_TIME)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 3e-3
    assert abs(u.var() - 1.0 / 12.0) < 3e-3


def test_streams_decorrelated():
    n = 100_000
    base = prng.ray_base(np.uint32(0), np.arange(n, dtype=np.uint32),
                         np.zeros(n, np.uint32))
    u1 = prng.uniform(base, prng.P_LAMBERT_A).astype(np.float64)
    u2 = prng.uniform(base, prng.P_LAMBERT_B).astype(np.float64)
    corr = np.corrcoef(u1, u2)[0, 1]
    assert abs(corr) < 0.01


def test_bounce_and_salt_streams_differ():
    base = prng.ray_base(np.uint32(0), np.uint32(5), np.uint32(6))
    b0 = prng.bounce_base(base, np.uint32(0))
    b1 = prng.bounce_base(base, np.uint32(1))
    assert b0 != b1
    m0 = prng.stream_bits(b0, prng.P_MEDIUM, np.uint32(0))
    m1 = prng.stream_bits(b0, prng.P_MEDIUM, np.uint32(1))
    assert m0 != m1
