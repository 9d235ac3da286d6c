"""Thin-lens camera semantics vs closed forms (camera.rs:34-95)."""

import numpy as np

from hyper_ray_tracer_tpu.camera import get_rays, make_basis
from hyper_ray_tracer_tpu.models.scene import CameraConfig
from hyper_ray_tracer_tpu.ops import rng as prng


def _bases(n, seed=7):
    return prng.ray_base(np.uint32(seed), np.arange(n, dtype=np.uint32),
                         np.zeros(n, np.uint32))


def test_center_ray_points_at_look_at():
    """With aperture 0, the s=t=0.5 ray passes through look_at."""
    cfg = CameraConfig((3.0, 2.0, 5.0), (-1.0, 0.5, 0.0), 40.0, 0.0)
    basis = make_basis(cfg, 400, 225)
    o, d, _ = get_rays(basis, _bases(1), np.float32([0.5]),
                       np.float32([0.5]), np)
    np.testing.assert_allclose(o[0], np.float32(cfg.look_from), atol=1e-6)
    to_at = np.float32(cfg.look_at) - np.float32(cfg.look_from)
    cos = (d[0] @ to_at) / (np.linalg.norm(d[0]) * np.linalg.norm(to_at))
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)


def test_fov_spans_viewport():
    """camera.rs:68-71: vertical viewport = 2 tan(fov/2) * focus_dist."""
    cfg = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    basis = make_basis(cfg, 100, 100)  # square: viewport_w == viewport_h
    # fov 90, focus 1 => half-height tan(45) = 1.
    np.testing.assert_allclose(np.linalg.norm(basis.vertical), 2.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(basis.horizontal), 2.0,
                               atol=1e-6)
    # Corner ray t=s=1 heads to (+1, +1, -1).
    _, d, _ = get_rays(basis, _bases(1), np.float32([1.0]),
                       np.float32([1.0]), np)
    np.testing.assert_allclose(d[0], [1.0, 1.0, -1.0], atol=1e-6)


def test_orthonormal_basis_and_aspect():
    cfg = CameraConfig((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), 20.0, 0.0)
    basis = make_basis(cfg, 1280, 720)
    w = (np.float32(cfg.look_from) - np.float32(cfg.look_at))
    w /= np.linalg.norm(w)
    assert abs(basis.u @ basis.v) < 1e-6
    assert abs(basis.u @ w) < 1e-6
    assert abs(basis.v @ w) < 1e-6
    ratio = (np.linalg.norm(basis.horizontal)
             / np.linalg.norm(basis.vertical))
    np.testing.assert_allclose(ratio, 1280.0 / 720.0, rtol=1e-5)


def test_defocus_blur_offsets_origin_within_lens():
    """camera.rs:86-91: origin perturbed inside the lens disk; the ray still
    hits the same focal-plane point (direction compensates the offset)."""
    cfg = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 2.0,
                       focus_dist=3.0)
    basis = make_basis(cfg, 64, 64)
    n = 512
    o, d, _ = get_rays(basis, _bases(n), np.full(n, 0.25, np.float32),
                       np.full(n, 0.75, np.float32), np)
    r = np.linalg.norm(o, axis=-1)
    assert (r <= 1.0 + 1e-5).all()  # lens_radius = aperture/2 = 1
    assert r.std() > 0.05  # actually spread over the disk
    # Every ray converges on the same focal-plane point.
    focal = o + d
    np.testing.assert_allclose(
        focal, np.broadcast_to(focal[0:1], focal.shape), atol=1e-5)


def test_shutter_time_range():
    cfg = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       time0=0.25, time1=0.75)
    basis = make_basis(cfg, 32, 32)
    n = 4096
    _, _, tm = get_rays(basis, _bases(n), np.full(n, 0.5, np.float32),
                        np.full(n, 0.5, np.float32), np)
    assert (tm >= 0.25).all() and (tm < 0.75).all()
    assert abs(tm.mean() - 0.5) < 0.01  # ~uniform over the shutter
