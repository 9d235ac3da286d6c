"""Current bounce component profile (final scene, inference mode)."""
import numpy as np, time
import jax, jax.numpy as jnp
from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.render import prepare_scene, make_ray_colorer, T_MIN
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
from hyper_ray_tracer_tpu.ops.intersect import make_hit_detailer, gather_prim
from hyper_ray_tracer_tpu.ops.materials import shade
from hyper_ray_tracer_tpu.ops import rng as prng

scene = build_scene("final")
arrays, bvh, use_bvh = prepare_scene(scene)
host_geom = scene.arrays.geom
arrays, bvh = jax.device_put((arrays, bvh))
static = scene.static; geom = arrays.geom
W,H = 400,225; N=W*H
basis = jax.device_put(make_basis(scene.camera, W, H))

colorer = make_ray_colorer(scene, W, H, 10, use_bvh, differentiable=False)
state = jax.jit(colorer.init_state)(basis, jnp.arange(N, dtype=jnp.int32), jnp.zeros((N,), jnp.int32), np.uint32(0))

REPS = 10
def loop(f):
    def run():
        def body(i, acc):
            r = f(i)
            return acc + jax.tree.leaves(r)[0].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    return jax.jit(run)

# full bounce step
f_step = loop(lambda i: colorer.bounce_step(arrays, bvh, state, i.astype(jnp.uint32)).radiance)
# intersect only
scan = make_scan_intersector(static, host_geom)
bb = prng.bounce_base(state.base, jnp.uint32(0))
f_scan = loop(lambda i: scan(geom, state.o, state.d, state.time, T_MIN, bb + i.astype(jnp.uint32), state.alive)[0])
# camera init
f_init = loop(lambda i: colorer.init_state(basis, jnp.arange(N, dtype=jnp.int32) + i.astype(jnp.int32)*0, jnp.zeros((N,), jnp.int32), np.uint32(0)).d)

_ = np.asarray(jnp.ones((4,)))
def bench(name, f):
    r = f(); _ = np.asarray(r)
    t0=time.perf_counter(); r = f(); _ = np.asarray(r)
    print(f"{name}: {(time.perf_counter()-t0)/REPS*1e3:7.2f} ms", flush=True)

bench("full bounce ", f_step)
bench("intersect   ", f_scan)
bench("camera init ", f_init)
