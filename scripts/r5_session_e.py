"""Round-5 on-chip session E (one process, one TPU window):

  1. FULL pytest suite on the real chip (TPU_TESTS_r05 evidence);
  2. clear caches, then — LAST, it may exhaust HBM — config[2] at
     bands=1 (the whole frame as one span band: no banding overhead,
     ~2.9 GB chunk array + residuals).
"""
import gc
import os
import runpy
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
os.environ["GVRT_TEST_TPU"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

import pytest
t0 = time.time()
rc = pytest.main(["-q", "tests/"])
print(f"pytest rc: {rc} in {time.time()-t0:.0f}s", flush=True)

jax.clear_caches()
gc.collect()
print("==== train from scratch, extended (D run reached 29.98 dB at "
      "3000 steps, still climbing) ====", flush=True)
sys.argv = ["train_scratch.py", "7000", "128", "1200"]
t0 = time.time()
try:
    runpy.run_path(os.path.join(HERE, "train_scratch.py"),
                   run_name="__main__")
    print(f"train_scratch total {time.time()-t0:.0f}s", flush=True)
except Exception as e:
    print(f"train_scratch FAILED after {time.time()-t0:.0f}s: "
          f"{type(e).__name__}: {e}", flush=True)

jax.clear_caches()
gc.collect()
print("==== config2 span bands=1 (risky: may OOM; run LAST) ====",
      flush=True)
sys.argv = ["config2_scale.py", "5000000", "1"]
t0 = time.time()
try:
    runpy.run_path(os.path.join(HERE, "config2_scale.py"),
                   run_name="__main__")
    print(f"config2 bands=1 total {time.time()-t0:.0f}s", flush=True)
except Exception as e:  # OOM expected to be possible; suite result stands
    print(f"config2 bands=1 FAILED after {time.time()-t0:.0f}s: "
          f"{type(e).__name__}: {e}", flush=True)
