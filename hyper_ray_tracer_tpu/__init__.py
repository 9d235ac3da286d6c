"""TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas reimplementation of the capability surface of
the Rust reference ``SkillerRaptor/hyper-ray-tracer`` (the *Ray Tracing in
One Weekend / The Next Week* feature set), redesigned for TPUs: SoA scenes,
flattened skip-pointer BVH, wavefront ``lax.scan`` integrator, counter-based
RNG, and ray sharding over device meshes.  See SURVEY.md for the structural
map of the reference.
"""

import os as _os


def _enable_compile_cache():
    """Point JAX at a persistent compilation cache (opt out with
    HRT_NO_COMPILE_CACHE=1, relocate with HRT_COMPILE_CACHE=<dir>).

    The compacted renderer compiles one XLA program per (segment shape,
    bucket tuple); on the tunneled TPU a cold reference-default render
    spends ~110 s compiling vs ~25 s rendering.  The persistent cache
    (measured supported by the axon backend) makes every later process
    reuse them.  A user-set jax_compilation_cache_dir is respected.
    """
    if _os.environ.get("HRT_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = _os.environ.get(
        "HRT_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      "hyper_ray_tracer_tpu", "xla"),
    )
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except OSError:  # read-only home: run uncached
        pass


_enable_compile_cache()

from .models.builders import SCENES, build_scene  # noqa: E402
from .models.scene import Scene, SceneBuilder  # noqa: E402
from .render import RenderSettings, render_image  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "SCENES",
    "build_scene",
    "Scene",
    "SceneBuilder",
    "RenderSettings",
    "render_image",
]
