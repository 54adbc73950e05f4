"""Round-5 on-chip session C (one process, one TPU window):

  1. gather-locality probe (scripts/tpu_gather_locality.py inline) —
     closes PROFILE 7d's open assumption about the 11.6 ns/row toll;
  2. clear caches, then the flagship bench (bench.py inline) for the
     round-5 number.
"""
import gc
import os
import runpy
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

print("==== gather locality probe ====", flush=True)
sys.argv = ["tpu_gather_locality.py"]
runpy.run_path(os.path.join(HERE, "tpu_gather_locality.py"),
               run_name="__main__")

jax.clear_caches()
gc.collect()
print("==== flagship bench ====", flush=True)
t0 = time.time()
sys.argv = ["bench.py"]
runpy.run_path(os.path.join(os.path.dirname(HERE), "bench.py"),
               run_name="__main__")
print(f"bench total {time.time()-t0:.0f}s", flush=True)
