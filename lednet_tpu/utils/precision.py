"""Mixed-precision helpers: cast parameter pytrees for bf16 inference/compute.

The model code is dtype-agnostic (flax infers from inputs/params); casting the
float leaves of the param tree to bf16 moves the convs/matmuls onto the MXU's
native precision while non-float leaves (e.g. int tables) are untouched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    def cast(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)
