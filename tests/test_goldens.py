"""Golden-render regression: committed compiled-kernel outputs.

`artifacts/goldens_r04/` holds deterministic synthetic views rendered by
the COMPILED Pallas kernel on the real chip (spool job 034, round 4), the
analog of the reference's checked-in eval sets
(`results/evaluations/3DGVRT/`).  This test re-renders the same scenes with
the locally available impl and compares against the committed arrays —
regression protection for kernel/binning refactors.  Tolerance: the
measured on-chip pallas-vs-scan deviation is ~1e-7 (TPU_TESTS_r03.md);
1e-4 leaves room for CPU-vs-TPU transcendental differences while still
catching any real math change.
"""
import json
import os

import numpy as np
import pytest

import golden_scenes

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "goldens_r04")

IMPL = "pallas" if os.environ.get("GVRT_TEST_TPU") else "interpret"


@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR),
                    reason="golden artifacts not yet committed")
def test_renders_match_committed_goldens():
    with open(os.path.join(GOLDEN_DIR, "goldens.json")) as f:
        meta = json.load(f)
    rendered = dict(golden_scenes.render_goldens(IMPL))
    assert set(meta["views"]) == set(rendered)
    for name, rgb in rendered.items():
        golden = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
        np.testing.assert_allclose(rgb, golden, atol=1e-4, err_msg=name)
