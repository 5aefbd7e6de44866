"""Optimizer + LR-schedule builders from mmseg-style config dicts.

Behavioral spec: the reference trains with mmengine ``OptimWrapper`` (SGD
lr=0.01 momentum=0.9 wd=5e-4, optional clip_grad) and a ``PolyLR`` scheduler
(power 0.9, by_epoch=False) — ``configs/LED_Net/...py:63-75`` and
``configs/_base_/schedules/*.py``. ``PolyLRRatio`` (reference
``mmseg/engine/schedulers/poly_ratio_scheduler.py:10``) scales the floor by
``eta_min_ratio`` instead of an absolute ``eta_min``.

torch-SGD parity: momentum buffer ``v = mu*v + (g + wd*p)``, update
``p -= lr*v`` — i.e. weight decay folds into the gradient *before* the
momentum trace, which is ``optax.add_decayed_weights`` -> ``optax.trace`` ->
lr scaling.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import optax


def build_lr_schedule(param_scheduler, base_lr: float) -> Callable[[int], float]:
    """Compose the (list of) scheduler configs into step -> lr."""
    if param_scheduler is None:
        return lambda step: base_lr
    cfgs = param_scheduler if isinstance(param_scheduler, (list, tuple)) \
        else [param_scheduler]

    import jax.numpy as jnp

    def lr_at(step):
        """Traceable: works on both python ints and jnp tracers."""
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        for cfg in cfgs:
            cfg = dict(cfg)
            stype = cfg.get('type', 'PolyLR')
            begin = cfg.get('begin', 0)
            end = cfg.get('end', None)
            span = None if end is None else max(end - begin, 1)
            if stype in ('PolyLR', 'PolyLRRatio'):
                if end is None or end <= begin:
                    continue
                power = cfg.get('power', 1.0)
                eta_min = cfg.get('eta_min', 0.0)
                if stype == 'PolyLRRatio' and cfg.get('eta_min_ratio') is not None:
                    eta_min = lr * cfg['eta_min_ratio']
                t = jnp.clip(step - begin, 0, span)
                frac = 1.0 - t / span
                lr = (lr - eta_min) * (frac ** power) + eta_min
            elif stype == 'LinearLR':
                if end is None or end <= begin:
                    continue
                start_factor = cfg.get('start_factor', 1.0 / 3)
                end_factor = cfg.get('end_factor', 1.0)
                t = jnp.clip(step - begin, 0, span)
                f = start_factor + (end_factor - start_factor) * t / span
                lr = jnp.where(step >= begin, lr * f, lr)
            elif stype == 'ConstantLR':
                factor = cfg.get('factor', 1.0)
                active = (step >= begin) if end is None else \
                    ((step >= begin) & (step < end))
                lr = jnp.where(active, lr * factor, lr)
            elif stype == 'MultiStepLR':
                gamma = cfg.get('gamma', 0.1)
                count = sum(jnp.where(step >= m, 1.0, 0.0)
                            for m in cfg.get('milestones', []))
                lr = lr * (gamma ** count)
            else:
                raise ValueError(f'Unsupported scheduler: {stype}')
        return lr

    return lr_at


def build_optimizer(optim_wrapper: Dict, param_scheduler=None):
    """Build the optax chain from mmseg ``optim_wrapper`` config.

    Returns ``(tx, lr_schedule)`` — the schedule is exposed for logging.
    """
    ow = dict(optim_wrapper or {})
    opt_cfg = dict(ow.get('optimizer', dict(type='SGD', lr=0.01)))
    otype = opt_cfg.pop('type', 'SGD')
    lr = opt_cfg.pop('lr', 0.01)
    schedule = build_lr_schedule(param_scheduler, lr)

    paramwise_cfg = dict(ow.get('paramwise_cfg') or {})
    constructor = ow.get('constructor')

    chain: List[optax.GradientTransformation] = []
    clip = ow.get('clip_grad')
    if clip:
        if 'max_norm' in clip:
            chain.append(optax.clip_by_global_norm(clip['max_norm']))
        elif 'clip_value' in clip:
            chain.append(optax.clip(clip['clip_value']))

    def decay_transform(wd):
        if paramwise_cfg:
            return scaled_weight_decay(wd, paramwise_cfg)
        return optax.add_decayed_weights(wd)

    if otype == 'SGD':
        wd = opt_cfg.pop('weight_decay', 0.0)
        momentum = opt_cfg.pop('momentum', 0.0)
        nesterov = opt_cfg.pop('nesterov', False)
        if wd:
            chain.append(decay_transform(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif otype in ('Adam', 'AdamW'):
        wd = opt_cfg.pop('weight_decay', 0.01 if otype == 'AdamW' else 0.0)
        betas = opt_cfg.pop('betas', (0.9, 0.999))
        eps = opt_cfg.pop('eps', 1e-8)
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if wd:
            chain.append(decay_transform(wd))
    else:
        raise ValueError(f'Unsupported optimizer: {otype}')

    if constructor == 'LearningRateDecayOptimizerConstructor' or \
            'decay_rate' in paramwise_cfg:
        chain.append(layer_decay_scale(paramwise_cfg))
    custom = paramwise_cfg.get('custom_keys') or {}
    if any('lr_mult' in dict(v) for v in custom.values()) or \
            paramwise_cfg.get('bias_lr_mult') is not None:
        chain.append(paramwise_lr_scale(paramwise_cfg))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain), schedule


def _path_str(path) -> str:
    return '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                    for k in path).lower()


def _layer_id(path: str, num_layers: int, decay_type: str) -> int:
    """Reference ``layer_decay_optimizer_constructor.py`` layer binning:
    patch embed -> 0, block i -> i+1, everything else -> num_layers+1."""
    import re
    if 'patch_embed' in path or 'stem' in path or 'pos_embed' in path \
            or 'cls_token' in path:
        return 0
    m = re.search(r'(?:^|/)b(\d+)_', path) or \
        re.search(r'(?:^|/)(?:blocks?|layers?)[._/]?(\d+)', path) or \
        re.search(r's(\d+)_b(\d+)', path)
    if m:
        idx = int(m.group(m.lastindex))
        if decay_type == 'stage_wise':
            return idx + 1
        return min(idx + 1, num_layers)
    return num_layers + 1


def layer_decay_scale(paramwise_cfg: Dict):
    """optax transform scaling updates by layer-wise LR decay (reference
    ``mmseg/engine/optimizers/layer_decay_optimizer_constructor.py``)."""
    import jax
    decay_rate = paramwise_cfg.get('decay_rate', 0.9)
    num_layers = paramwise_cfg.get('num_layers', 12)
    decay_type = paramwise_cfg.get('decay_type', 'layer_wise')

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(path, u):
            lid = _layer_id(_path_str(path), num_layers, decay_type)
            return u * (decay_rate ** (num_layers + 1 - lid))
        import jax.tree_util as jtu
        return jtu.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _match_custom_key(path_str: str, custom_order, custom):
    """Longest matching custom key, or None. mmseg matches against dotted
    ``module.param`` names — accept either separator."""
    dotted = path_str.replace('/', '.')
    for k in custom_order:
        if k.lower() in dotted:
            return custom[k]
    return None


def _is_norm_path(s: str) -> bool:
    s = '/' + s  # so a top-level 'bn/...' module matches '/bn/' too
    return any(t in s for t in ('/bn/', '/norm', '/gn/', '/ln/',
                                'batchnorm', 'layernorm'))


def _is_bias_path(s: str) -> bool:
    return s.endswith('/bias') or s.endswith('/b')


def _dwconv_prefixes(params) -> set:
    """Module prefixes whose ``kernel`` is a depthwise conv.

    Reference semantics (``force_default_constructor.py:169-171``):
    ``isinstance(module, Conv2d) and module.in_channels == module.groups``.
    In a flax pytree that is exactly a 4-D HWIO kernel with ``shape[-2] == 1``
    (one input channel per group — which, as in torch, also matches a plain
    conv on a 1-channel input)."""
    import jax.tree_util as jtu
    prefixes = set()
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        s = _path_str(path)
        if s.endswith('/kernel') and getattr(leaf, 'ndim', 0) == 4 \
                and leaf.shape[-2] == 1:
            prefixes.add(s.rsplit('/', 1)[0])
    return prefixes


def _decay_mult_fn(paramwise_cfg: Dict, params=None):
    """Per-leaf weight-decay multiplier (reference
    DefaultOptimWrapperConstructor / ``force_default_constructor.py``):
    the longest matching ``custom_keys`` entry wins (its ``decay_mult``
    defaulting to 1) — unless ``force_default_settings`` is set, in which
    case the default rules override the custom value where they apply
    (``force_default_constructor.py:202-233``). Default rule order is the
    reference's elif chain: norm -> bias -> depthwise conv -> flat (1-D).
    Fractional multipliers are honored, not coerced to 0/1.

    ``dwconv_decay_mult`` and the module-shape-dependent rules need the
    params tree; callers that have it pass ``params`` (the returned fn then
    takes ``(path, leaf)``); without it the dwconv/flat rules are skipped
    for backward compatibility with path-only callers."""
    norm_mult = paramwise_cfg.get('norm_decay_mult', None)
    bias_mult = paramwise_cfg.get('bias_decay_mult', None)
    dw_mult = paramwise_cfg.get('dwconv_decay_mult', None)
    flat_mult = paramwise_cfg.get('flat_decay_mult', None)
    force = bool(paramwise_cfg.get('force_default_settings', False))
    custom = {k: dict(v) for k, v in
              (paramwise_cfg.get('custom_keys') or {}).items()}
    custom_order = sorted(custom, key=len, reverse=True)
    dw_prefixes = _dwconv_prefixes(params) if params is not None else set()

    def mult(path, leaf=None) -> float:
        s = _path_str(path)
        hit = _match_custom_key(s, custom_order, custom)
        m = float(hit.get('decay_mult', 1.0)) if hit is not None else None
        if hit is None or force:
            # the None-ness of each mult is part of its elif condition in
            # the reference, so e.g. a norm bias falls through to the bias
            # rule when norm_decay_mult is unset
            if _is_norm_path(s) and norm_mult is not None:
                m = float(norm_mult)
            elif _is_bias_path(s) and bias_mult is not None:
                m = float(bias_mult)
            elif s.rsplit('/', 1)[0] in dw_prefixes and dw_mult is not None:
                m = float(dw_mult)
            elif leaf is not None and getattr(leaf, 'ndim', None) == 1 \
                    and flat_mult is not None:
                m = float(flat_mult)
        return 1.0 if m is None else m

    return mult


def scaled_weight_decay(wd: float, paramwise_cfg: Dict):
    """``add_decayed_weights`` with a per-leaf multiplier instead of a
    binary mask, so fractional ``decay_mult`` values behave as in mmseg."""
    import jax.tree_util as jtu

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError('scaled_weight_decay requires params')
        mult = _decay_mult_fn(paramwise_cfg, params)
        updates = jtu.tree_map_with_path(
            lambda path, u, p: u + wd * mult(path, p) * p, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def custom_lr_scale(custom_keys: Dict):
    """Per-key ``lr_mult`` from ``paramwise_cfg.custom_keys`` (reference
    DefaultOptimWrapperConstructor semantics: longest matching substring
    wins; dotted mmseg keys match the '/'-joined jax paths)."""
    return paramwise_lr_scale(dict(custom_keys=custom_keys))


def paramwise_lr_scale(paramwise_cfg: Dict):
    """Per-leaf LR multiplier: ``custom_keys[...].lr_mult`` (longest
    matching substring wins) plus ``bias_lr_mult`` for non-norm biases
    (reference ``force_default_constructor.py:205-209``: applied when no
    custom key matched, or always under ``force_default_settings``).
    ``dcn_offset_lr_mult`` is not applicable — this stack has no
    deformable convs (SURVEY §2.9)."""
    import jax.tree_util as jtu
    custom = {k: dict(v) for k, v in
              (paramwise_cfg.get('custom_keys') or {}).items()}
    custom_order = sorted(custom, key=len, reverse=True)
    bias_lr_mult = paramwise_cfg.get('bias_lr_mult', None)
    force = bool(paramwise_cfg.get('force_default_settings', False))

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(path, u):
            s = _path_str(path)
            hit = _match_custom_key(s, custom_order, custom)
            m = float(hit.get('lr_mult', 1.0)) if hit is not None else 1.0
            if (hit is None or force) and bias_lr_mult is not None \
                    and _is_bias_path(s) and not _is_norm_path(s):
                m = float(bias_lr_mult)
            return u * m

        return jtu.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def paramwise_decay_mask(paramwise_cfg: Dict):
    """Binary view of :func:`_decay_mult_fn` (kept for callers that need an
    optax-style mask; multiplier 0 -> no decay)."""

    def mask(params):
        import jax.tree_util as jtu
        mult = _decay_mult_fn(paramwise_cfg, params)
        return jtu.tree_map_with_path(lambda path, p: mult(path, p) != 0,
                                      params)

    return mask
