import time, numpy as np, jax, jax.numpy as jnp
from spectre_tpu.fields import limb as L
from spectre_tpu.fields.limb import _schoolbook
spec = L.fr_spec
n = spec.n_limbs
B = 1 << 18
rng = np.random.RandomState(0)
a = jax.device_put(rng.randint(0, spec.B, size=(B, n)).astype(np.int32))
b = jax.device_put(rng.randint(0, spec.B, size=(B, n)).astype(np.int32))
def bench(name, f, iters=3):
    t0=time.time(); r = f(); np.asarray(r[:2]); print(f"{name}: compile+1 {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for _ in range(iters):
        r = f(); np.asarray(r[:2])
    dt=(time.time()-t0)/iters
    print(f"{name}: {dt*1000:.1f}ms -> {B/dt/1e6:.1f} M/s", flush=True)
bench("dot only     ", jax.jit(lambda: _schoolbook(spec,a,b)))
bench("scanredc only", jax.jit(lambda: L._redc(spec, jnp.concatenate([a,a,a[:, :1]], axis=-1))))
bench("full mont_mul", jax.jit(lambda: L._redc(spec, _schoolbook(spec,a,b))))
