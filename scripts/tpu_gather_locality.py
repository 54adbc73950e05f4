"""Row-toll LOCALITY experiment (r4 verdict item 3, PROFILE section 7d).

The 11.6 ns/row chained-gather toll was measured on random permutations
only, but PROFILE 7d's speed-of-light derivation ASSUMES the toll is
independent of access locality.  Span banding + y-sorting make the
pipeline's gathers nearly monotonic, so the assumption is now
load-bearing: this probe measures the chained dependent-iteration gather
rate (the E1/E4 methodology — data dependency between iterations, one
D2H sync) across index distributions:

  random    : uniform permutation-like random rows (the 11.6 ns baseline)
  sorted    : strictly ascending rows (perfectly contiguous streams)
  almost    : ascending + small jitter (the y-sorted pair_gauss shape)
  blocked   : contiguous 256-row blocks in random order (chunked access)
  window    : random rows inside a narrow 1/8 window of the source
              (the span-banding expansion gather shape)

Usage: python scripts/tpu_gather_locality.py [n_src] [n_rows] [cols]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_SRC = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
COLS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
K = int(os.environ.get("GVRT_CHAIN", 8))

rng = np.random.default_rng(0)
src = jnp.asarray(rng.standard_normal((N_SRC, COLS)).astype(np.float32))

idx_sets = {}
idx_sets["random"] = rng.integers(0, N_SRC, N_ROWS).astype(np.int32)
idx_sets["sorted"] = np.sort(idx_sets["random"]).astype(np.int32)
jitter = rng.integers(-64, 64, N_ROWS)
idx_sets["almost"] = np.clip(idx_sets["sorted"] + jitter, 0,
                             N_SRC - 1).astype(np.int32)
blocks = rng.permutation(N_ROWS // 256)
idx_sets["blocked"] = ((blocks[:, None] * 256
                        + np.arange(256)[None, :]).reshape(-1)
                       % N_SRC).astype(np.int32)
w0 = N_SRC // 3
idx_sets["window"] = (w0 + rng.integers(0, N_SRC // 8, N_ROWS)).astype(
    np.int32)


def chained(idx):
    idx = jnp.asarray(idx)

    @jax.jit
    def run(s):
        def body(i, carry):
            s, acc = carry
            g = s[idx]                       # (N_ROWS, COLS)
            acc = acc + g[0, 0] + g[-1, -1]
            # real dependency: perturb ONE element of the source
            s = s.at[0, 0].add(1e-12 * acc)
            return (s, acc)
        return jax.lax.fori_loop(0, K, body, (s, 0.0))

    s, acc = run(src)
    _ = float(acc)                           # compile+warm
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        s, acc = run(src)
        _ = float(acc)
        best = min(best, (time.time() - t0) / K)
    return best


print(f"backend {jax.default_backend()}  src {N_SRC}x{COLS}  "
      f"rows {N_ROWS}  chain {K}", flush=True)
out = {}
for name, idx in idx_sets.items():
    t = chained(idx)
    ns_row = t / N_ROWS * 1e9
    out[name] = ns_row
    print(f"{name:8s}: {t*1e3:7.2f} ms/iter  = {ns_row:6.2f} ns/row",
          flush=True)
print(json.dumps({"n_src": N_SRC, "n_rows": N_ROWS, "cols": COLS,
                  "ns_per_row": out}), flush=True)
