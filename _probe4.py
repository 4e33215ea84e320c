import time
import numpy as np
import jax, jax.numpy as jnp

def sync(x): return np.asarray(x).ravel()[0]

def timeit(f, *a, reps=5):
    out = f(*a); sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    s = sync(out)
    return (time.time() - t0) / reps

# --- gather microbench ---
N, C = 32768, 32
x = jnp.asarray(np.random.RandomState(0).randn(1, N, C), jnp.float32)
for P in (32768, 32768*8, 32768*27):
    idx = jnp.asarray(np.random.RandomState(1).randint(0, N, (1, P, 1)), jnp.int32)
    f = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
    dt = timeit(f, x, idx)
    print(f"gather P={P}: {dt*1e3:.2f} ms  ({P*C*4/dt/1e9:.1f} GB/s)", flush=True)

# --- dense shift-FMA chain for comparison (one axis_interp, 10 shifts) ---
D = 32
xv = jnp.asarray(np.random.RandomState(0).randn(1, D, D, D, C), jnp.float32)
dlt = jnp.asarray(np.random.RandomState(1).uniform(-2, 2, (1, D, D, D)), jnp.float32)
from deformablelka_tpu.ops.deform3d import _axis_interp
g = jax.jit(lambda xv, dlt: _axis_interp(xv, dlt, 0, 4))
dt = timeit(g, xv, dlt)
print(f"axis_interp R=4: {dt*1e3:.2f} ms", flush=True)

# --- single deform_conv3d op at stage-0 size ---
from deformablelka_tpu.ops.deform3d import deform_conv3d
K = 27
off = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (1, D, D, D, 3*K)), jnp.float32)
w = jnp.asarray(np.random.RandomState(3).randn(3,3,3,C,C)*0.1, jnp.float32)
h = jax.jit(lambda x, o: deform_conv3d(x, o, w, None, stride=1, padding=1, dilation=1, groups=1))
dt = timeit(h, xv, off)
print(f"deform_conv3d 32^3 C=32: {dt*1e3:.2f} ms", flush=True)

# --- per-block model forwards ---
from deformablelka_tpu.models.dlka_former import dlka_former_synapse
for block in ["TransformerBlock_3D_LKA", "TransformerBlock",
              "TransformerBlock_3D_single_deform_LKA"]:
    model = dlka_former_synapse(num_classes=14, do_ds=False, trans_block=block)
    xb = jnp.zeros((1, 64, 128, 128, 1), jnp.bfloat16)
    t0 = time.time()
    v = jax.jit(model.init)(jax.random.PRNGKey(0), xb)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    sync(fwd(v, xb))
    tc = time.time() - t0
    dt = timeit(fwd, v, xb, reps=5)
    print(f"{block}: compile+warm {tc:.1f}s, {dt*1000:.1f} ms/fwd", flush=True)
