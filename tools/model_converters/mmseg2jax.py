#!/usr/bin/env python
"""Convert a torch mmseg checkpoint (.pth) into this framework's parameters.

Analogue of the reference's converter family (``tools/model_converters/*``,
incl. the inverse ``vitjax2mmseg.py``). The matcher works at *unit* (module)
granularity, not raw tensors:

1. load the torch ``state_dict`` (CPU), split fused MHA ``in_proj_*`` tensors
   into this framework's separate q/kv projections,
2. initialize the target jax model from the given config,
3. group both sides into units (a conv, a norm, an MHA proj, ...) keyed by
   their parent path, with per-tensor roles (w/b + BN running stats ->
   ``batch_stats``),
4. match units: exact canonicalized-name matches first, then in
   natural-sorted order within each shape signature — so repeated
   same-shaped blocks land on the right indices (``layer2`` < ``layer10``)
   and BatchNorm running statistics are transplanted alongside scale/bias,
5. report unmatched units on both sides — the iteration loop the SURVEY
   prescribes for reconstructing the withheld backbone against
   ``iter_80000.pth``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import re
from collections import defaultdict, deque


def parse_args():
    p = argparse.ArgumentParser(description='torch mmseg -> jax converter')
    p.add_argument('config', help='target (jax) config file')
    p.add_argument('pth', help='source torch checkpoint (.pth)')
    p.add_argument('out', help='output orbax checkpoint directory')
    p.add_argument('--verbose', action='store_true')
    return p.parse_args()


# role of a tensor inside its unit, normalized across frameworks
_ROLE = {
    'weight': 'w', 'kernel': 'w', 'scale': 'w', 'alpha': 'w',
    'bias': 'b',
    'running_mean': 'rm', 'mean': 'rm',
    'running_var': 'rv', 'var': 'rv',
}


def _role(last: str) -> str:
    return _ROLE.get(last, last)


def _canon(tokens) -> str:
    """Canonical unit name: lowercase alphanumerics only, with this
    framework's structural wrapper tokens dropped and separators erased so
    e.g. torch ``backbone.stem.0.bn`` and jax ``backbone/stem_0/norm/bn``
    compare equal (``stem.0`` vs ``stem_0`` differ only in token
    boundaries; signature equality guards against merge collisions)."""
    out = []
    for t in tokens:
        t = re.sub(r'[^0-9a-z]+', '', str(t).lower())
        if t in ('norm', 'module', 'model'):
            continue
        if t:
            out.append(t)
    return ''.join(out)


def _natkey(s: str):
    return [int(t) if t.isdigit() else t
            for t in re.split(r'(\d+)', s)]


def _is_deconv_key(name: str) -> bool:
    """Transposed-conv detection by key name (state dicts carry no layer
    types; mmseg's deconv layers are named 'deconv*' / 'upsample_4x.0' /
    'upsample_2x.0')."""
    n = name.lower()
    return 'deconv' in n or 'upsample_4x' in n or 'upsample_2x' in n


def convert_tensor(name, arr):
    import numpy as np
    if arr.ndim == 4:
        if _is_deconv_key(name):
            # torch ConvTranspose2d weight is (cin, cout, kh, kw) and flax
            # ConvTranspose correlates (no kernel flip), so the torch kernel
            # must be spatially flipped on top of the layout change
            return np.transpose(arr, (2, 3, 0, 1))[::-1, ::-1]
        return np.transpose(arr, (2, 3, 1, 0))  # conv OIHW -> HWIO
    if arr.ndim == 2:        # linear (out, in) -> (in, out)
        return arr.T
    return arr


def _sig_shape(shape):
    """Shape for signature purposes: a 1x1 conv kernel and a dense kernel
    are the same unit kind."""
    if len(shape) == 4 and shape[0] == 1 and shape[1] == 1:
        return tuple(shape[2:])
    return tuple(shape)


def _split_in_proj(sd):
    """Split torch fused-MHA ``in_proj_weight``/``in_proj_bias`` (3C rows:
    q,k,v) into separate q (C) and kv (2C) tensors matching this framework's
    EfficientAttention parameterization."""
    out = {}
    for k, v in sd.items():
        if k.endswith('in_proj_weight') or k.endswith('in_proj_bias'):
            c = v.shape[0] // 3
            suffix = 'weight' if k.endswith('weight') else 'bias'
            prefix = k[:-len('in_proj_' + suffix)]
            out[prefix + 'q.' + suffix] = v[:c]
            out[prefix + 'kv.' + suffix] = v[c:]
        else:
            out[k] = v
    return out


def build_torch_units(sd):
    """Group torch tensors by key prefix into units with per-role arrays."""
    import numpy as np
    units = {}
    for k, v in sd.items():
        if not hasattr(v, 'shape') or k.endswith('num_batches_tracked'):
            continue
        arr = v.detach().cpu().numpy() if hasattr(v, 'detach') \
            else np.asarray(v)
        prefix, _, last = k.rpartition('.')
        units.setdefault(prefix, {})[_role(last)] = (k, arr)
    return units


def build_jax_units(params, batch_stats):
    """Group jax leaves (params + batch_stats) by parent path."""
    import jax
    import numpy as np
    units = defaultdict(dict)
    for tree, is_stat in ((params, False), (batch_stats, True)):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            toks = [getattr(p, 'key', getattr(p, 'idx', p)) for p in path]
            toks = [str(t) for t in toks]
            parent, last = tuple(toks[:-1]), toks[-1]
            units[parent][_role(last)] = (
                '/'.join(toks), tuple(np.asarray(leaf).shape), is_stat)
    return units


def match_units(torch_units, jax_units, verbose=False):
    """Return {jax_leaf_path: converted ndarray} + unmatched reports."""
    def t_sig(unit):
        return tuple(sorted(
            (r, _sig_shape(convert_tensor(k, a).shape))
            for r, (k, a) in unit.items()))

    def j_sig(unit):
        return tuple(sorted((r, _sig_shape(s))
                            for r, (p, s, _) in unit.items()))

    t_keys = sorted(torch_units, key=_natkey)
    j_keys = sorted(jax_units, key=lambda t: _natkey('/'.join(t)))

    # pass 1: exact canonical-name + signature match
    t_by_canon = defaultdict(list)
    for tk in t_keys:
        t_by_canon[_canon(tk.split('.'))].append(tk)
    pairs, used_t = [], set()
    unmatched_j = []
    for jk in j_keys:
        canon = _canon(jk)
        cands = [tk for tk in t_by_canon.get(canon, ())
                 if tk not in used_t and
                 t_sig(torch_units[tk]) == j_sig(jax_units[jk])]
        if cands:
            if len(cands) > 1:
                print(f"  WARNING: canonical name {canon!r} is ambiguous "
                      f"({len(cands)} torch candidates); picking "
                      f"{cands[0]!r} (natural order)")
            pairs.append((jk, cands[0]))
            used_t.add(cands[0])
        else:
            unmatched_j.append(jk)

    # pass 2: signature queues in natural-sorted order
    by_sig = defaultdict(deque)
    for tk in t_keys:
        if tk not in used_t:
            by_sig[t_sig(torch_units[tk])].append(tk)
    still_j = []
    for jk in unmatched_j:
        q = by_sig.get(j_sig(jax_units[jk]))
        if q:
            tk = q.popleft()
            used_t.add(tk)
            pairs.append((jk, tk))
        else:
            still_j.append(jk)
    leftover_t = [tk for tk in t_keys if tk not in used_t]

    assigned = {}
    for jk, tk in sorted(pairs, key=lambda p: _natkey('/'.join(p[0]))):
        if verbose:
            print(f"  {'/'.join(jk) or '<root>'}  <-  {tk or '<root>'}")
        for role, (path, shape, is_stat) in jax_units[jk].items():
            k, arr = torch_units[tk][role]
            conv = convert_tensor(k, arr)
            if conv.shape != shape:
                conv = conv.reshape(shape)  # 1x1 conv kernel <-> dense
            assigned[(path, is_stat)] = conv
    return assigned, still_j, leftover_t


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import torch
    import orbax.checkpoint as ocp
    import lednet_tpu
    from lednet_tpu.config import Config
    from lednet_tpu.registry import MODELS

    lednet_tpu.register_all_modules()
    cfg = Config.fromfile(args.config)
    model = MODELS.build(dict(cfg.model))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    from lednet_tpu.engine.state import jit_init
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    params = jax.device_get(variables['params'])
    batch_stats = jax.device_get(variables.get('batch_stats', {}))

    sd = torch.load(args.pth, map_location='cpu', weights_only=False)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    sd = {re.sub(r'^(module\.|model\.)', '', k): v for k, v in sd.items()}
    sd = _split_in_proj(sd)

    torch_units = build_torch_units(sd)
    jax_units = build_jax_units(params, batch_stats)
    assigned, miss_j, miss_t = match_units(torch_units, jax_units,
                                           verbose=args.verbose)

    print(f'matched {len(jax_units) - len(miss_j)}/{len(jax_units)} '
          f'parameter units ({len(assigned)} tensors, '
          f'incl. BN running stats)')
    if miss_j:
        print(f'  {len(miss_j)} jax units unmatched (left at init)')
        if args.verbose:
            for k in miss_j:
                print(f'  UNMATCHED (jax): {"/".join(k)}')
    if miss_t:
        print(f'  {len(miss_t)} torch units unconsumed')
        if args.verbose:
            for k in miss_t:
                print(f'  UNCONSUMED (torch): {k}')

    def apply(tree, is_stat):
        paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in paths:
            key = '/'.join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                           for p in path)
            arr = assigned.get((key, is_stat))
            leaves.append(jnp.asarray(arr, leaf.dtype)
                          if arr is not None else leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = apply(params, False)
    batch_stats = apply(batch_stats, True)

    import os
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.out),
        dict(params=params, batch_stats=batch_stats, step=0))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
