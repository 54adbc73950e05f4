"""NaN/Inf guards for the render + training pipeline (SURVEY.md §5).

The reference's only runtime checking is Vulkan validation layers (forced
on, base/VulkanRTBase.cpp:1376-1381); XLA SPMD is data-race-free by
construction, so the TPU analog is numeric validation: checkify-wrapped
evaluation that pinpoints the first non-finite intermediate, plus a light
assert_finite helper for train loops.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side check (call on concrete outputs): every leaf is finite."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad}/{arr.size} "
                f"non-finite values")


def checked(fn: Callable) -> Callable:
    """Wrap a jittable function with checkify float checks.

    Returns a function with the same signature that raises on the first
    NaN/Inf produced anywhere inside `fn` (device-side detection, exact
    op reported).  Use for debugging only — the checks serialize some ops.

        safe_render = checked(lambda m: renderer.render(m, cam)["rgb"])
        img = safe_render(model)   # raises checkify.JaxRuntimeError on NaN
    """
    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
