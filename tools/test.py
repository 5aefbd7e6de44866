#!/usr/bin/env python
"""Evaluation entry point (CLI mirrors the reference ``tools/test.py``)."""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

import argparse
import json
import os.path as osp


def parse_args():
    p = argparse.ArgumentParser(description='Test a segmentor (TPU-native)')
    p.add_argument('config', help='config file path')
    p.add_argument('checkpoint', help='checkpoint directory (orbax)')
    p.add_argument('--work-dir', help='dir to save evaluation results')
    p.add_argument('--out', help='dump predictions to this directory')
    p.add_argument('--tta', action='store_true', help='test-time augmentation')
    p.add_argument('--cfg-options', nargs='+', default=[])
    p.add_argument('--launcher', default='none')
    p.add_argument('--local_rank', '--local-rank', type=int, default=0)
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
    work_dir = args.work_dir or osp.join(
        './work_dirs', osp.splitext(osp.basename(args.config))[0])
    if args.tta:
        # swap the test pipeline for the TTA pipeline (reference
        # tools/test.py:120-123)
        cfg['test_dataloader']['dataset']['pipeline'] = cfg['tta_pipeline']
    if args.out:
        # dump predictions through the metric (reference tools/test.py:126-128)
        ev = dict(cfg.get('test_evaluator') or cfg.get('val_evaluator')
                  or dict(type='IoUMetric'))
        ev['output_dir'] = args.out
        cfg['test_evaluator'] = ev
    runner = Runner(cfg, work_dir=work_dir)
    metrics = runner.test(args.checkpoint)
    print(json.dumps(metrics))
    out_path = osp.join(work_dir, 'test_results.json')
    with open(out_path, 'w', encoding='utf-8') as f:
        json.dump(metrics, f)


if __name__ == '__main__':
    main()
