import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from spectre_tpu.poly.msm_pippenger import msm_pippenger
from spectre_tpu.curves import host as H
from spectre_tpu.fields.params import BN254_FR as FR
import random
rng = random.Random(9)
curve = H.bn254_g1
N = 1 << 16
pts = []
acc = None
t0 = time.time()
for i in range(N):
    acc = curve.add(acc, curve.gen)
    pts.append(acc)   # (i+1) * G
print(f"gen points {time.time()-t0:.1f}s", flush=True)
scalars = [rng.randrange(FR) for _ in range(N)]
t0 = time.time()
got = msm_pippenger(pts, scalars, "bn254_g1", c=8)
dt = time.time() - t0
want = curve.mul(curve.gen, sum(k * (i + 1) for i, k in enumerate(scalars)) % FR)
print(f"msm 2^16: {dt:.1f}s -> {N/dt:.0f} pts/s; correct: {got == want}", flush=True)
# second run (compile cached)
t0 = time.time()
got2 = msm_pippenger(pts, scalars, "bn254_g1", c=8)
print(f"msm 2^16 warm: {time.time()-t0:.1f}s", flush=True)
