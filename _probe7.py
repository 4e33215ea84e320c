import time
import numpy as np
import jax, jax.numpy as jnp
from deformablelka_tpu.ops.pallas.deform3d_kernel import deform_conv3d_pallas

def sync(x): return np.asarray(x).ravel()[0]

def timeit(f, *a, reps=10):
    t0 = time.time(); out = f(*a); sync(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    sync(out)
    return tc, (time.time() - t0) / reps

rng = np.random.RandomState(0)
for (D, C) in ((32, 32), (16, 64), (8, 128)):
    x = jnp.asarray(rng.randn(1, D, D, D, C), jnp.bfloat16)
    off = jnp.asarray(rng.uniform(-1, 1, (1, D, D, D, 81)), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3,3,3,C,C)*0.1, jnp.bfloat16)
    for R in (1, 2):
        f = jax.jit(lambda x, o: deform_conv3d_pallas(x, o, w, R))
        try:
            tc, dt = timeit(f, x, off)
            print(f"pallas R={R} D={D} C={C}: compile {tc:.1f}s run {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"pallas R={R} D={D} C={C}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
