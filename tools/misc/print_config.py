#!/usr/bin/env python
"""Print the fully-merged config (reference ``tools/misc/print_config.py``)."""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import pprint


def main():
    p = argparse.ArgumentParser(description='Print the merged config')
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()

    from lednet_tpu.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(kv.split('=', 1) for kv in args.cfg_options))
    for key, value in cfg.items():
        print(f'{key} = {pprint.pformat(value, width=100)}')


if __name__ == '__main__':
    main()
