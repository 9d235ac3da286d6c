import numpy as np, time
import jax, jax.numpy as jnp

x = jax.device_put(jnp.ones((65536, 3)))
@jax.jit
def step(x): return x * 1.000001 + 0.000001
@jax.jit
def asum(x): return x.sum()

import sys
t=time.perf_counter(); _ = np.asarray(step(x)); print(f"warm {time.perf_counter()-t:.1f}s", flush=True)
t=time.perf_counter(); _ = float(asum(x)); print(f"scalar1 {time.perf_counter()-t:.2f}s", flush=True)
t=time.perf_counter(); _ = float(asum(x)); print(f"scalar2 {time.perf_counter()-t:.2f}s", flush=True)
# chained dispatches without transfers
t0=time.perf_counter()
y = x
for _ in range(50): y = step(y)
_ = np.asarray(y)
t_chain = (time.perf_counter()-t0)/50
# dispatch + scalar transfer each iteration
t0=time.perf_counter()
y = x
for _ in range(20):
    y = step(y)
    c = float(asum(y))  # scalar device->host
t_sync = (time.perf_counter()-t0)/20
print(f"chained dispatch: {t_chain*1e3:.2f} ms/step; with scalar readback: {t_sync*1e3:.2f} ms/step")
