"""Perlin noise: determinism, range, np/jnp agreement, reference quirks."""

import jax.numpy as jnp
import numpy as np

from hyper_ray_tracer_tpu.ops import perlin


def test_tables_deterministic():
    a = perlin.make_tables(0)
    b = perlin.make_tables(0)
    np.testing.assert_array_equal(a.vectors, b.vectors)
    np.testing.assert_array_equal(a.perm_x, b.perm_x)
    c = perlin.make_tables(1)
    assert not np.array_equal(a.perm_x, c.perm_x)


def test_vectors_unit_norm():
    t = perlin.make_tables(0)
    np.testing.assert_allclose(
        np.linalg.norm(t.vectors, axis=-1), 1.0, atol=1e-5
    )
    for p in (t.perm_x, t.perm_y, t.perm_z):
        assert sorted(p.tolist()) == list(range(256))


def test_noise_range_and_lattice_zero():
    t = perlin.make_tables(0)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (10_000, 3)).astype(np.float32)
    n = perlin.noise(t, pts, np)
    assert np.abs(n).max() <= 1.0 + 1e-5
    # At integer lattice points the smoothed weights collapse to the single
    # corner gradient dotted with a zero weight vector -> noise == 0.
    lat = rng.integers(-10, 10, (100, 3)).astype(np.float32)
    np.testing.assert_allclose(perlin.noise(t, lat, np), 0.0, atol=1e-6)


def test_negative_coords_wrap():
    t = perlin.make_tables(0)
    p = np.float32([[-3.25, -7.5, -100.75]])
    v = perlin.noise(t, p, np)
    assert np.isfinite(v).all()


def test_turbulence_positive_and_deterministic():
    t = perlin.make_tables(0)
    pts = np.random.default_rng(1).uniform(-5, 5, (1000, 3)).astype(np.float32)
    a = perlin.turbulence(t, pts, np)
    b = perlin.turbulence(t, pts, np)
    np.testing.assert_array_equal(a, b)
    assert (a >= 0).all()


def test_turbulence_matches_table_noise_octaves():
    """The computed-hash turbulence (renderer hot path) must equal the
    table-based noise octave sum (oracle form) — same hash functions."""
    t = perlin.make_tables(3)
    pts = np.random.default_rng(4).uniform(-8, 8, (500, 3)).astype(np.float32)
    via_tables = None
    p = pts
    w = np.float32(1.0)
    for _ in range(perlin.TURBULENCE_DEPTH):
        term = w * perlin.noise(t, p, np)
        via_tables = term if via_tables is None else via_tables + term
        w = np.float32(w * 0.5)
        p = p * 2.0
    np.testing.assert_allclose(
        perlin.turbulence(t, pts, np), np.abs(via_tables), atol=2e-6)


def test_numpy_jax_agree():
    t = perlin.make_tables(0)
    pts = np.random.default_rng(2).uniform(-20, 20, (512, 3)).astype(np.float32)
    a = perlin.noise(t, pts, np)
    b = perlin.noise(t, jnp.asarray(pts), jnp)
    np.testing.assert_allclose(a, np.asarray(b), atol=2e-6)
    ta = perlin.turbulence(t, pts, np)
    tb = perlin.turbulence(t, jnp.asarray(pts), jnp)
    np.testing.assert_allclose(ta, np.asarray(tb), atol=1e-5)


def test_turbulence_xyz_bit_identical():
    """The component-form turbulence (Pallas-kernel-shaped: no
    [..., depth, 3] intermediates) must be BIT-identical to the stacked
    form — same hash rounds, corner order, and octave accumulation."""
    t = perlin.make_tables(7)
    pts = np.random.default_rng(9).uniform(-30, 30, (2048, 3)).astype(
        np.float32)
    a = perlin.turbulence(t, jnp.asarray(pts), jnp)
    b = perlin.turbulence_xyz(t.keys, jnp.asarray(pts[:, 0]),
                              jnp.asarray(pts[:, 1]),
                              jnp.asarray(pts[:, 2]), jnp)
    assert bool((np.asarray(a) == np.asarray(b)).all())
