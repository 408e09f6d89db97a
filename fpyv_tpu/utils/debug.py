"""Numerical-health guards: the rebuild's sanitizer analog (SURVEY.md §5).

The reference is single-threaded NumPy, so its "sanitizers" are nonexistent;
the TPU equivalents are NaN/Inf guards over state pytrees. Use
:func:`finite_mask` inside jitted loops (branch-free per-env health flags —
a poisoned env can be auto-reset like a crash) and :func:`assert_finite`
host-side at iteration boundaries (raises with the offending leaf paths).
``jax.config.update("jax_debug_nans", True)`` remains the heavyweight
whole-program option; these are the targeted, always-on-capable ones.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def finite_mask(tree: Any, batch_ndim: int = 1) -> jnp.ndarray:
    """(...,)-bool per-env health flags: True where EVERY leaf is finite.

    Leaves are reduced over all but their first `batch_ndim` axes; non-float
    leaves count as healthy. jit/vmap/scan-safe.
    """
    leaves = [l for l in jax.tree.leaves(tree)
              if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    if not leaves:
        raise ValueError("tree has no floating leaves")
    batch_shape = jnp.shape(leaves[0])[:batch_ndim]
    ok = jnp.ones(batch_shape, bool)
    for l in leaves:
        l = jnp.asarray(l)
        axes = tuple(range(batch_ndim, l.ndim))
        ok = ok & jnp.all(jnp.isfinite(l), axis=axes)
    return ok


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side check: raises FloatingPointError naming every non-finite leaf."""
    bad: List[Tuple[str, int]] = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            n_bad = int((~np.isfinite(arr)).sum())
            if n_bad:
                bad.append((jax.tree_util.keystr(path), n_bad))
    if bad:
        detail = ", ".join(f"{p} ({n} values)" for p, n in bad)
        raise FloatingPointError(f"non-finite values in {name}: {detail}")
