import numpy as np
import jax, jax.numpy as jnp
from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis, get_rays
from hyper_ray_tracer_tpu.render import prepare_scene, T_MIN, make_ray_colorer
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
from hyper_ray_tracer_tpu.ops.intersect import BIG, make_prim_intersector, make_hit_detailer, gather_prim
from hyper_ray_tracer_tpu.ops.materials import shade
from hyper_ray_tracer_tpu.ops import rng as prng

scene = build_scene("final")
arrays, bvh, use_bvh = prepare_scene(scene)
host_geom = scene.arrays.geom
arrays = jax.device_put(arrays)
static = scene.static; geom = arrays.geom
W,H = 400,225; N=W*H
basis = make_basis(scene.camera, W, H)
pix = jnp.arange(N, dtype=jnp.uint32); sam = jnp.zeros((N,), jnp.uint32)
base = prng.ray_base(jnp.uint32(0), pix, sam)
x = (pix % W).astype(jnp.float32); y = (pix // W).astype(jnp.float32)
o, d, tmv = get_rays(basis, base, x/(W-1), y/(H-1), jnp)

scan = make_scan_intersector(static, host_geom)
prim_hit_t = make_prim_intersector(static)
detail_fn = make_hit_detailer(static)

@jax.jit
def run():
    def bounce(carry, bi):
        o, d, alive = carry
        bb = prng.bounce_base(base, bi)
        t_hit, prim = scan(geom, o, d, tmv, T_MIN, bb, alive)
        hit = prim >= 0
        pidx = jnp.maximum(prim, 0)
        pf = gather_prim(geom, pidx)
        det = detail_fn(pf, o, d, tmv, jnp.where(hit, t_hit, 1.0), jnp)
        sc = shade(arrays, geom.material[pidx], det, d, bb, static, jnp)
        alive = alive & hit & sc.did_scatter
        o = jnp.where(alive[:, None], det.point, o)
        d = jnp.where(alive[:, None], sc.direction, d)
        return (o, d, alive), alive.sum()
    init = (o, d, jnp.ones((N,), bool))
    _, counts = jax.lax.scan(bounce, init, jnp.arange(10, dtype=jnp.uint32))
    return counts

c = np.asarray(run())
print("alive after each bounce:", (c / N).round(3).tolist())
