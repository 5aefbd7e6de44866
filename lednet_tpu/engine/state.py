"""Train state + the jitted SPMD train/eval steps.

This replaces the reference's Runner.train_step path
(``tools/train.py`` -> mmengine IterBasedTrainLoop ->
``model.train_step`` -> DDP backward + NCCL all-reduce, SURVEY.md §3.1) with
one ``jax.jit``-compiled SPMD program over a 1-D data mesh:

- inputs/labels sharded on the ``data`` axis, state replicated,
- gradient all-reduce and SyncBN cross-replica means fall out of GSPMD,
- preprocessing (normalize/pad) is fused into the same program
  (north-star: on-device preprocessing).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from lednet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def jit_init(model, rngs, *args, **kwargs):
    """``model.init`` under jit.

    Eager init dispatches every op separately — on a tunneled TPU (axon)
    each eager op is a network roundtrip, turning init into minutes. One
    jitted program brings it back to one compile + one execution.
    """
    def _init(rngs, *a):
        return model.init(rngs, *a, **kwargs)
    return jax.jit(_init)(rngs, *args)


def create_train_state(model, tx, sample_batch, rng=None) -> TrainState:
    """Initialize parameters/batch-stats and the optimizer state."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jit_init(model, {'params': rng, 'dropout': rng},
                         sample_batch['inputs'],
                         sample_batch['gt_seg_map'], method='loss')
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def parse_losses(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """mmengine semantics: the total is the sum of every 'loss'-keyed term."""
    return sum(v for k, v in losses.items() if 'loss' in k.split('.')[-1])


def make_train_step(model, tx, preprocessor=None,
                    rng: Optional[jax.Array] = None,
                    amp: bool = False) -> Callable:
    """Build the jitted train step: (state, inputs, labels) -> (state, logs).

    ``amp=True`` (the reference's ``--amp`` analogue) computes the forward/
    backward in bf16 — f32 master weights are cast inside the loss, so
    gradients and the optimizer update stay f32. bf16's 8-bit exponent
    matches f32, so no loss scaling is needed (unlike torch fp16 AMP).
    """
    base_rng = rng if rng is not None else jax.random.PRNGKey(42)

    def step_fn(state: TrainState, inputs, labels):
        if preprocessor is not None:
            inputs, labels, _ = preprocessor(inputs, labels, training=True)

        def loss_fn(params):
            run_params = params
            run_inputs = inputs
            if amp:
                from lednet_tpu.utils.precision import cast_floating
                run_params = cast_floating(params, jnp.bfloat16)
                run_inputs = inputs.astype(jnp.bfloat16)
            out, mutated = model.apply(
                {'params': run_params, 'batch_stats': state.batch_stats},
                run_inputs, labels, method='loss', mutable=['batch_stats'],
                rngs={'dropout': jax.random.fold_in(base_rng, state.step)})
            return parse_losses(out), (out, mutated)

        (total, (losses, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=mutated.get('batch_stats',
                                                          state.batch_stats),
                                  opt_state=opt_state)
        logs = dict(losses)
        logs['loss'] = total
        logs['grad_norm'] = optax.global_norm(grads)
        return new_state, logs

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model, preprocessor=None, mode: str = 'whole') -> Callable:
    """Build the jitted predict step -> logits at (padded) input resolution."""
    method = 'predict_slide' if mode == 'slide' else 'predict'

    def step_fn(state: TrainState, inputs):
        if preprocessor is not None:
            inputs, _, _ = preprocessor(inputs, None, training=False)
        return model.apply({'params': state.params,
                            'batch_stats': state.batch_stats},
                           inputs, method=method)

    return jax.jit(step_fn)
