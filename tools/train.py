#!/usr/bin/env python
"""Training entry point.

CLI mirrors the reference ``tools/train.py`` (config positional, --work-dir,
--resume, --amp, --cfg-options). The mmengine Runner is replaced by the
SPMD Runner (lednet_tpu/engine/runner.py). ``--launcher`` joins multi-host
runs into one JAX coordination service (lednet_tpu/utils/dist.py) — within
a host, parallelism is the device mesh, not process ranks.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

import argparse
import os
import os.path as osp


def parse_args():
    p = argparse.ArgumentParser(description='Train a segmentor (TPU-native)')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', help='dir to save logs and checkpoints')
    p.add_argument('--resume', action='store_true',
                   help='resume from the latest checkpoint in work_dir')
    p.add_argument('--amp', action='store_true',
                   help='enable bf16 mixed-precision compute')
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='override config entries: key=value (dotted keys ok)')
    p.add_argument('--launcher', default='none',
                   choices=['none', 'pytorch', 'slurm', 'mpi'],
                   help='multi-host coordination (one process per host; '
                        'intra-host parallelism is the SPMD mesh)')
    p.add_argument('--local_rank', '--local-rank', type=int, default=0)
    p.add_argument('--seed', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import lednet_tpu
    from lednet_tpu.config import Config
    from lednet_tpu.engine.runner import Runner
    from lednet_tpu.utils.dist import init_distributed

    lednet_tpu.register_all_modules()
    init_distributed(args.launcher)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(kv.split('=', 1) for kv in args.cfg_options))
    work_dir = args.work_dir or cfg.get('work_dir') or osp.join(
        './work_dirs', osp.splitext(osp.basename(args.config))[0])
    if args.amp:
        cfg['bf16'] = True
    runner = Runner(cfg, work_dir=work_dir, seed=args.seed)
    runner.train(resume=args.resume or cfg.get('resume', False))


if __name__ == '__main__':
    main()
