"""BASELINE config[4] proof-of-training: perturb a scene, fine-tune it back.

The reference ships rendered eval sets as the proof its renderer works
(results/evaluations/); the analogous artifact for this framework's training
capability (which the reference does not have — SURVEY.md section 0) is a
committed PSNR-vs-step curve showing the optimizer actually recovering a
scene:

  1. render a clean synthetic scene from a ring of cameras (ground truth),
  2. perturb means / SH / opacity with noise (several dB of damage),
  3. Adam fine-tune against the clean renders (train/trainer.py, the same
     per-group 3DGS learning-rate recipe as the train CLI),
  4. track PSNR on a HELD-OUT camera (never sampled in training),
  5. save the recovered .ply + the curve.

Usage: python scripts/train_recover.py [out_dir]
Env:   GVRT_STEPS (default 400), GVRT_N (default 20000), GVRT_RES (256)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.parallel import camera_batch
from gvrt_tpu.render.tiled import TiledRenderer
from gvrt_tpu.train import TrainConfig, Trainer
from gvrt_tpu.utils.metrics import psnr

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/train_recover"
STEPS = int(os.environ.get("GVRT_STEPS", 400))
N = int(os.environ.get("GVRT_N", 20_000))
RES = int(os.environ.get("GVRT_RES", 256))
N_CAMS = 13  # cams[0] is held out; 12 training views
BATCH = 2

os.makedirs(OUT, exist_ok=True)
cfg = g3.DEFAULT_CONFIG
impl = "pallas" if jax.default_backend() == "tpu" else "interpret"

# ---- clean scene + ground-truth renders -----------------------------------
clean = g3.random_gaussians(jax.random.key(0), N, extent=0.8,
                            scale_range=(-4.8, -3.2))
clean.means = clean.means.at[:, 2].add(-3.0)

cams = []
for i in range(N_CAMS):
    th = 2 * np.pi * i / N_CAMS
    c2w = np.eye(4)
    # small orbital ring facing the object (keeps every view informative)
    c2w[:3, 3] = [0.35 * np.cos(th), 0.35 * np.sin(th), 0.0]
    cams.append(g3.Camera.from_fovy(RES, RES, 60.0, c2w,
                                    name=f"ring_{i:02d}"))

r = TiledRenderer(RES, RES, cfg, impl=impl)
capacity = r.plan(clean, cams[:4])
print(f"capacity {capacity}", flush=True)
t0 = time.time()
targets = [np.asarray(r.render(clean, c)["rgb"]) for c in cams]
print(f"rendered {N_CAMS} ground-truth views in {time.time()-t0:.1f}s",
      flush=True)

# ---- perturb ----------------------------------------------------------------
k1, k2, k3 = jax.random.split(jax.random.key(42), 3)
noisy = g3.GaussianModel(
    means=clean.means + 0.01 * jax.random.normal(k1, clean.means.shape),
    scales_log=clean.scales_log,
    quats=clean.quats,
    opacity_logit=clean.opacity_logit
    + 0.5 * jax.random.normal(k2, clean.opacity_logit.shape),
    sh_dc=clean.sh_dc + 0.15 * jax.random.normal(k3, clean.sh_dc.shape),
    sh_rest=clean.sh_rest,
)

def eval_psnr(m):
    out = r.render(m, cams[0])  # held-out view (never trained on)
    return psnr(np.asarray(out["rgb"]) * 255.0, targets[0] * 255.0)

p0 = eval_psnr(noisy)
print(f"held-out PSNR after perturbation: {p0:.2f} dB", flush=True)

# ---- fine-tune --------------------------------------------------------------
tc = TrainConfig(total_steps=STEPS, scene_extent=0.8)
trainer = Trainer(RES, RES, cfg, tc, capacity, impl=impl)
state = trainer.init(noisy)
rng = np.random.default_rng(0)
train_pool = np.arange(1, N_CAMS)  # cams[0] strictly held out

curve = [(0, float(p0))]
t0 = time.time()
for step in range(1, STEPS + 1):
    idx = rng.choice(train_pool, size=BATCH, replace=False)
    batch = camera_batch([cams[i] for i in idx], cfg)
    tgt = jnp.stack([jnp.asarray(targets[i]) for i in idx])
    state, loss = trainer.step(state, batch, tgt)
    if step % max(1, STEPS // 20) == 0 or step == STEPS:
        p = eval_psnr(state[0])
        curve.append((step, float(p)))
        print(f"step {step:4d}: loss {float(loss):.6f} "
              f"held-out PSNR {p:.2f} dB  ({time.time()-t0:.0f}s)",
              flush=True)

final = curve[-1][1]
state[0].to_ply(os.path.join(OUT, "recovered.ply"))
with open(os.path.join(OUT, "psnr_curve.json"), "w") as f:
    json.dump({"n_gauss": N, "res": RES, "steps": STEPS,
               "batch": BATCH, "train_views": len(train_pool),
               "held_out_view": cams[0].name,
               "psnr_start": float(p0), "psnr_final": float(final),
               "curve": curve}, f, indent=1)
print(json.dumps({"psnr_start": float(p0), "psnr_final": float(final),
                  "gain_db": float(final - p0)}), flush=True)
assert final - p0 >= 5.0, (
    f"training recovered only {final - p0:.2f} dB (need >= 5)")
print(f"recovered {final - p0:.2f} dB; artifacts in {OUT}", flush=True)
