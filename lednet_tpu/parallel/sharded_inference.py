"""Spatially-sharded whole-image inference.

New TPU-native capability with no reference analogue (the reference's only
big-image strategy is the sequential slide loop,
``mmseg/models/segmentors/encoder_decoder.py:241-292``): put ONE image on a
device mesh with its rows sharded over a ``spatial`` axis and run the whole
forward as a single SPMD program. GSPMD inserts the conv halo exchanges, so
the result is numerically the unsharded forward — useful when a single
image's activations exceed one chip's HBM (remote sensing, gigapixel
pathology) and for cutting single-image latency across a pod slice.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lednet_tpu.parallel.mesh import make_mesh


# identity-keyed (flax modules with dict-valued fields are unhashable);
# entries hold the model alive so ids cannot be recycled under us
_STEP_CACHE = {}


def _build_step(model, preprocessor):
    """One jitted step per (model, preprocessor) pair — a fresh closure per
    call would force a full GSPMD recompile for every image."""
    key = (id(model), id(preprocessor))
    cached = _STEP_CACHE.get(key)
    if cached is not None:
        return cached[0]

    @jax.jit
    def step(variables, x):
        if preprocessor is not None:
            x, _, _ = preprocessor(x, None, training=False)
        return model.apply(variables, x, method='predict')

    _STEP_CACHE[key] = (step, model, preprocessor)
    return step


def sharded_predict(model, variables, images, mesh: Optional[Mesh] = None,
                    preprocessor=None, spatial_axis: str = 'spatial',
                    multiple: int = 32):
    """Whole-mode ``predict`` with image rows sharded over ``spatial_axis``.

    Args:
        model: a built segmentor (EncoderDecoder-style flax module).
        variables: its ``{'params', 'batch_stats'}`` tree (replicated).
        images: NHWC uint8/float array (host or device).
        mesh: a Mesh containing ``spatial_axis``; defaults to a 1-D mesh over
            all local devices.
        preprocessor: optional ``SegDataPreProcessor`` fused into the step.
        multiple: pad H/W to this multiple before the forward (matching the
            whole-mode padding contract); the pad rows are sliced off the
            returned logits.

    Returns:
        Full-resolution logits with the same sharding layout.
    """
    if mesh is None:
        mesh = make_mesh(axis_name=spatial_axis)
    images = jnp.asarray(images)
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    pad_h = (-h) % multiple
    pad_w = (-w) % multiple
    if pad_h or pad_w:
        images = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    image_sh = NamedSharding(mesh, P(None, spatial_axis))
    images = jax.device_put(images, image_sh)
    variables = jax.device_put(variables, NamedSharding(mesh, P()))

    logits = _build_step(model, preprocessor)(variables, images)
    if pad_h or pad_w:
        logits = logits[:, :h, :w, :]
    return logits
