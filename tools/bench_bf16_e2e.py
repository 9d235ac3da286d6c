import time, numpy as np, jax, jax.numpy as jnp
from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.render import (T_MIN, block_order,
    make_compacting_renderer, make_ray_colorer, prepare_scene)
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector

W,H,SPP,DEPTH = 400,225,16,10
N = W*H*SPP
scene = build_scene("final")
print("device:", jax.devices()[0], flush=True)
arrays, bvh, mode = prepare_scene(scene)
basis = make_basis(scene.camera, W, H)
colorer = make_ray_colorer(scene, W, H, DEPTH, mode, differentiable=False)
pix = jnp.asarray(np.tile(block_order(W,H), SPP))
sam = jnp.asarray(np.repeat(np.arange(SPP, dtype=np.int32), W*H))
arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
state = jax.block_until_ready(jax.jit(colorer.init_state)(basis, pix, sam, np.uint32(0)))

def timeit(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    return best

for bf in (False, True):
    trace = make_scan_intersector(scene.static, scene.arrays.geom, bf16=bf)
    tr = jax.jit(lambda o,d,t,b,a,_t=trace: _t(arrays.geom,o,d,t,T_MIN,b,a)[0].sum())
    t = timeit(lambda: np.asarray(tr(state.o, state.d, state.time, state.base, state.alive)))
    print(f"trace bf16={bf}: {t*1e3:7.1f} ms", flush=True)

for bf in (False, True):
    run = make_compacting_renderer(scene, W, H, DEPTH, mode, bf16_hits=bf)
    perm = jax.device_put(jnp.asarray(block_order(W,H)))
    t = timeit(lambda: run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0)), reps=5)
    print(f"full rep bf16={bf}: {t*1e3:7.1f} ms  ({N/t/1e6:.3f} Mrays/s)", flush=True)
