"""TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas reimplementation of the capability surface of
the Rust reference ``SkillerRaptor/hyper-ray-tracer`` (the *Ray Tracing in
One Weekend / The Next Week* feature set), redesigned for TPUs: SoA scenes,
flattened skip-pointer BVH, wavefront ``lax.scan`` integrator, counter-based
RNG, and ray sharding over device meshes.  See SURVEY.md for the structural
map of the reference.
"""

from .models.builders import SCENES, build_scene
from .models.scene import Scene, SceneBuilder
from .render import RenderSettings, render_image

__version__ = "0.1.0"

__all__ = [
    "SCENES",
    "build_scene",
    "Scene",
    "SceneBuilder",
    "RenderSettings",
    "render_image",
]
