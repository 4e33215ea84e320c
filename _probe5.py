import time
import numpy as np
import jax, jax.numpy as jnp
from deformablelka_tpu.ops.deform3d import deform_conv3d, deform_conv3d_window

def sync(x): return np.asarray(x).ravel()[0]

def timeit(f, *a, reps=5):
    t0 = time.time(); out = f(*a); sync(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    sync(out)
    return tc, (time.time() - t0) / reps

rng = np.random.RandomState(0)
for (D, C) in ((32, 32), (16, 64)):
    x = jnp.asarray(rng.randn(1, D, D, D, C), jnp.bfloat16)
    off = jnp.asarray(rng.uniform(-1, 1, (1, D, D, D, 81)), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3,3,3,C,C)*0.1, jnp.bfloat16)
    g = jax.jit(lambda x, o: deform_conv3d(x, o, w, None, stride=1, padding=1, dilation=1, groups=1))
    tc, dt = timeit(g, x, off)
    print(f"gather D={D} C={C}: compile {tc:.1f}s run {dt*1e3:.1f} ms", flush=True)
    for R in (1, 2):
        f = jax.jit(lambda x, o: deform_conv3d_window(x, o, w, None, stride=1, padding=1, dilation=1, groups=1, radius=R))
        tc, dt = timeit(f, x, off)
        print(f"window R={R} D={D} C={C}: compile {tc:.1f}s run {dt*1e3:.1f} ms", flush=True)
