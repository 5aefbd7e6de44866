#!/usr/bin/env python
"""Plot/summarize training scalars.

Reference analogue: ``tools/analysis_tools/analyze_logs.py`` — reads the
json-lines scalar log (our ``work_dir/vis_data/scalars.json``) and either
plots curves or reports iteration-time statistics.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description='Analyze training logs')
    p.add_argument('task', choices=['plot_curve', 'cal_train_time'])
    p.add_argument('json_logs', nargs='+', help='scalars.json files')
    p.add_argument('--keys', nargs='+', default=['loss'])
    p.add_argument('--legend', nargs='+', default=None)
    p.add_argument('--title', default=None)
    p.add_argument('--out', default=None)
    return p.parse_args()


def load_log(path):
    records = []
    with open(path, encoding='utf-8') as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def main():
    args = parse_args()
    logs = [load_log(p) for p in args.json_logs]

    if args.task == 'cal_train_time':
        for path, records in zip(args.json_logs, logs):
            times = [r['time'] for r in records if 'time' in r]
            if not times:
                print(f'{path}: no time records')
                continue
            import numpy as np
            print(f'{path}: mean {np.mean(times):.4f}s, '
                  f'fastest {np.min(times):.4f}s, slowest {np.max(times):.4f}s')
        return

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.figure()
    for i, (path, records) in enumerate(zip(args.json_logs, logs)):
        for key in args.keys:
            xs = [r['step'] for r in records if key in r]
            ys = [r[key] for r in records if key in r]
            if not xs:
                print(f'{path}: key {key} not found')
                continue
            label = (args.legend[i] if args.legend else path) + f':{key}'
            plt.plot(xs, ys, label=label)
    plt.xlabel('iter')
    plt.legend()
    if args.title:
        plt.title(args.title)
    out = args.out or 'curve.png'
    plt.savefig(out, dpi=150)
    print(f'saved to {out}')


if __name__ == '__main__':
    main()
