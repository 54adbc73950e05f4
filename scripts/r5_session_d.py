"""Round-5 on-chip session D (one process, one TPU window):

  1. config[2] 5M span banding at bands=2 — the configuration the r4 SMEM
     ceiling blocked; the packed prefetch maps (r5) fit 2x the chunks;
  2. clear caches, then the config[4] train-from-scratch proof
     (scripts/train_scratch.py) through the real CLI.
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

print("==== config2 span bands=2 ====", flush=True)
sys.argv = ["config2_scale.py", "5000000", "2"]
t0 = time.time()
runpy.run_path(os.path.join(HERE, "config2_scale.py"), run_name="__main__")
print(f"config2 bands=2 total {time.time()-t0:.0f}s", flush=True)

jax.clear_caches()
gc.collect()
print("==== train from scratch (config[4] hardening) ====", flush=True)
sys.argv = ["train_scratch.py", "3000", "128", "1200"]
t0 = time.time()
runpy.run_path(os.path.join(HERE, "train_scratch.py"), run_name="__main__")
print(f"train_scratch total {time.time()-t0:.0f}s", flush=True)
