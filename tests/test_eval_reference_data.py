"""Validate the PSNR/SSIM harness on the reference's checked-in eval images.

The reference ships rendered eval sets (results/evaluations/{3DGVRT,vk3dgs,
3dgrt}) plus ground_truth but no .ply scenes, so cross-implementation image
parity is validated three ways inside this repo (brute vs scan vs pallas);
THIS test instead validates the metric harness itself against real data:
running our port of eval_quality.py over the reference's own renders must
reproduce sane, method-ranked quality numbers.
"""

import os

import numpy as np
import pytest

from gvrt_tpu.utils import evaluate_dirs
from gvrt_tpu.utils.metrics import psnr, ssim

REF_EVAL = "/root/reference/results/evaluations"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_EVAL, "ground_truth")),
    reason="reference eval images not mounted")


def test_eval_quality_on_reference_renders():
    res = evaluate_dirs(os.path.join(REF_EVAL, "ground_truth"),
                        [os.path.join(REF_EVAL, "3DGVRT")], verbose=False)
    r = res[os.path.join(REF_EVAL, "3DGVRT")]
    # a working renderer scored against its dataset's ground truth lands in
    # the usual 3DGS quality band; a broken metric lands near 0 or inf
    assert r["num_views"] >= 50
    assert 20.0 < r["psnr"] < 45.0, r
    assert 0.7 < r["ssim"] <= 1.0, r


def test_metrics_identity_and_noise():
    from gvrt_tpu.io.image import load_png
    gt_dir = os.path.join(REF_EVAL, "ground_truth")
    fname = sorted(os.listdir(gt_dir))[0]
    img = load_png(os.path.join(gt_dir, fname)).astype(np.float32)
    assert psnr(img, img) > 80
    assert ssim(img, img) > 0.999
    noisy = np.clip(img + np.random.default_rng(0).normal(
        0, 0.05 * 255, img.shape).astype(np.float32), 0, 255)
    assert 20 < psnr(img, noisy) < 30
    assert ssim(img, noisy) < 0.99
