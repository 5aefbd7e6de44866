#!/usr/bin/env python
"""Strip a training checkpoint for release.

Reference analogue: ``tools/misc/publish_model.py`` (drop optimizer state,
append a content hash to the filename). Our checkpoints are orbax
directories; the published copy keeps only params/batch_stats + meta.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import hashlib
import os
import os.path as osp
import shutil


def main():
    p = argparse.ArgumentParser(description='Publish a checkpoint')
    p.add_argument('in_ckpt', help='training checkpoint directory')
    p.add_argument('out_ckpt', help='output directory (sha suffix appended)')
    args = p.parse_args()

    import jax
    import orbax.checkpoint as ocp

    ckpter = ocp.StandardCheckpointer()
    # restore with no template: read raw pytree
    restored = ocp.PyTreeCheckpointer().restore(osp.abspath(args.in_ckpt))
    published = {k: restored[k] for k in ('params', 'batch_stats', 'step')
                 if k in restored}
    tmp = osp.abspath(args.out_ckpt.rstrip('/') + '_tmp')
    ocp.PyTreeCheckpointer().save(tmp, published)

    # content hash over the serialized leaves
    import numpy as np
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(published):
        h.update(np.asarray(leaf).tobytes())
    sha = h.hexdigest()[:8]
    final = osp.abspath(f'{args.out_ckpt.rstrip("/")}-{sha}')
    if osp.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    meta_src = osp.join(osp.abspath(args.in_ckpt), 'meta.json')
    if osp.exists(meta_src):
        shutil.copy(meta_src, osp.join(final, 'meta.json'))
    print(f'published to {final}')


if __name__ == '__main__':
    main()
