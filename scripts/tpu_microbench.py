"""Hardware microbenchmarks on the real chip -> roofline inputs (PROFILE.md).

Measures, with dispatch overhead amortized by chaining K iterations inside
one jit (the axon tunnel costs ~33 ms per host->device round trip, so naive
per-call timing is meaningless):

  * dispatch  : host->device->host round-trip latency (tiny op, 1 per call)
  * vpu_fma   : VPU f32 multiply-add throughput (flops/s)
  * vpu_exp   : transcendental throughput (exp/s)
  * mxu_f32   : f32 matmul throughput (flops/s)
  * mxu_bf16  : bf16 matmul throughput (flops/s)
  * hbm_copy  : HBM streaming bandwidth (bytes/s, read+write)
  * gather    : random-row gather rate (rows/s, 64-col f32 rows)
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def sync(x):
    _ = np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])
    return x


def bench(fn, *args, reps=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


results = {}

# dispatch latency
one = jnp.ones((8, 128), jnp.float32)
f_tiny = jax.jit(lambda x: x + 1.0)
dt = bench(f_tiny, one, reps=5)
results["dispatch_ms"] = dt * 1e3
print(f"dispatch round-trip: {dt*1e3:.2f} ms", flush=True)
DISPATCH = dt

K = 200

# VPU fma chain on a (256, 1024) f32 block: per iter 2 fma = 4 flops/elem
x = jnp.ones((256, 1024), jnp.float32) * 0.5
@jax.jit
def vpu_fma(x):
    def body(i, x):
        return x * 0.9999 + 0.1234
    return jax.lax.fori_loop(0, K * 8, body, x)
dt = bench(vpu_fma, x) - DISPATCH
flops = 256 * 1024 * 2 * K * 8
results["vpu_fma_tflops"] = flops / dt / 1e12
print(f"vpu fma: {flops/dt/1e12:.2f} Tflop/s", flush=True)

@jax.jit
def vpu_exp(x):
    def body(i, x):
        return jnp.exp(x * 1e-6)
    return jax.lax.fori_loop(0, K, body, x)
dt = bench(vpu_exp, x) - DISPATCH
rate = 256 * 1024 * K / dt
results["vpu_exp_per_s"] = rate
print(f"vpu exp: {rate/1e12:.3f} T/s (+1 mul each)", flush=True)

# MXU: (512,512)@(512,512) chained
for dtype, name in [(jnp.float32, "mxu_f32"), (jnp.bfloat16, "mxu_bf16")]:
    a = jnp.ones((512, 512), dtype) * 0.01
    @jax.jit
    def mxu(a):
        def body(i, a):
            return jnp.dot(a, a, preferred_element_type=dtype) * 0.001
        return jax.lax.fori_loop(0, K, body, a)
    dt = bench(mxu, a) - DISPATCH
    fl = 2 * 512**3 * K
    results[name + "_tflops"] = fl / dt / 1e12
    print(f"{name}: {fl/dt/1e12:.1f} Tflop/s", flush=True)

# small-K f32 matmul like the SH eval: (64,16)@(16,256)
a = jnp.ones((64, 16), jnp.float32)
b = jnp.ones((16, 256), jnp.float32)
@jax.jit
def mxu_small(a, b):
    def body(i, acc):
        return jnp.dot(a * (1.0 + acc[0, 0] * 0.0), b,
                       preferred_element_type=jnp.float32)
    return jax.lax.fori_loop(0, K * 8, body, jnp.zeros((64, 256)))
dt = bench(mxu_small, a, b) - DISPATCH
fl = 2 * 64 * 16 * 256 * K * 8
results["mxu_small_sh_tflops"] = fl / dt / 1e12
print(f"mxu small (64,16)@(16,256): {fl/dt/1e12:.2f} Tflop/s "
      f"({K*8/dt/1e6:.2f}M matmuls/s)", flush=True)

# HBM bandwidth: stream-copy a 256 MB array, chained with flip
big = jnp.ones((64 * 1024 * 1024,), jnp.float32)
@jax.jit
def hbm(x):
    def body(i, x):
        return -x
    return jax.lax.fori_loop(0, 16, body, x)
dt = bench(hbm, big) - DISPATCH
bw = big.size * 4 * 2 * 16 / dt
results["hbm_gbps"] = bw / 1e9
print(f"hbm copy: {bw/1e9:.0f} GB/s", flush=True)

# random-row gather: (300k+1, 64) table, 1M rows
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.standard_normal((300_001, 64), dtype=np.float32))
idx = jnp.asarray(rng.integers(0, 300_000, size=1_000_000, dtype=np.int64)
                  .astype(np.int32))
@jax.jit
def gather(tab, idx):
    def body(i, s):
        return s + tab[(idx + i) % 300_000].sum()
    return jax.lax.fori_loop(0, 8, body, 0.0)
dt = bench(gather, tab, idx) - DISPATCH
rate = 1_000_000 * 8 / dt
results["gather_rows_per_s"] = rate
print(f"gather 64-col rows: {rate/1e6:.0f}M rows/s ({1e9/rate:.1f} ns/row)",
      flush=True)

print(json.dumps(results), flush=True)
