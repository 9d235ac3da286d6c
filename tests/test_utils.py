"""PNG IO and checkpoint/resume."""

import numpy as np

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.render import RenderSettings, render_image
from hyper_ray_tracer_tpu.utils.image import read_png, to_u8, write_png


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((13, 31, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, to_u8(img))


def test_checkpoint_resume_bit_identical(tmp_path):
    scene = build_scene("three-spheres")
    base = dict(width=20, height=12, samples=4, depth=4, spp_chunk=2)
    full = render_image(scene, RenderSettings(**base))

    ck = str(tmp_path / "r.ckpt")
    # First run: interrupt after the first chunk by limiting samples to 2
    # with the same (width,height,samples,depth,seed) meta — simulate by
    # rendering 2 spp worth of chunks into the checkpoint of the full run.
    calls = {"n": 0}

    def interrupt(done, total):
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    try:
        render_image(scene, RenderSettings(**base, checkpoint_path=ck),
                     progress_cb=interrupt)
    except KeyboardInterrupt:
        pass

    resumed = render_image(scene, RenderSettings(**base, checkpoint_path=ck))
    np.testing.assert_array_equal(full, resumed)


def test_checkpoint_mismatch_restarts(tmp_path):
    scene = build_scene("three-spheres")
    ck = str(tmp_path / "r.ckpt")
    a = render_image(scene, RenderSettings(width=20, height=12, samples=2,
                                           depth=4, checkpoint_path=ck))
    # Different depth -> checkpoint must be ignored, not reused.
    b = render_image(scene, RenderSettings(width=20, height=12, samples=2,
                                           depth=3, checkpoint_path=ck))
    assert not np.array_equal(a, b)


def test_checkpoint_format_version_rejected(tmp_path, caplog):
    """Accumulators written by a release with a different rendered
    realization (format version) must be rejected, not blended."""
    import logging

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.render import RenderSettings, render_image
    from hyper_ray_tracer_tpu.utils import checkpoint as ckpt

    scene = build_scene("three-spheres")
    path = str(tmp_path / "c.ckpt")
    s = dict(width=16, height=9, samples=2, depth=3, seed=1)

    img_fresh = render_image(scene, RenderSettings(**s))

    # Forge a stale-version checkpoint claiming 1 finished sample of junk.
    junk = np.full((16 * 9, 3), 7.0, np.float64)
    ckpt.save_state(path, junk, 1, dict(scene="three-spheres", width=16,
                                        height=9, depth=3, seed=1,
                                        format=1))
    with caplog.at_level(logging.WARNING):
        img = render_image(scene, RenderSettings(**s, checkpoint_path=path))
    np.testing.assert_array_equal(img, img_fresh)  # started fresh
