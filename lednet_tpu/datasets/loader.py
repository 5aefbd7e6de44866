"""Host-side data loading: samplers, collation, threaded prefetch.

Replaces the reference's torch DataLoader + DefaultSampler/InfiniteSampler
(``configs/_base_/datasets/pascal_voc12.py:47,59``; mmengine samplers). Rank
sharding for multi-host SPMD follows the same round-robin contract as the
reference's DDP samplers: rank r of world W takes indices r, r+W, r+2W, ...
cv2/PIL release the GIL, so a thread pool keeps the TPU fed without the
multiprocess worker machinery torch needs.
"""
from __future__ import annotations

import itertools
import threading
import queue as queue_mod
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from lednet_tpu.registry import DATASETS


class InfiniteSampler:
    """Shuffled infinite index stream (mmengine InfiniteSampler semantics)."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1):
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        g = np.random.default_rng(self.seed)
        while True:
            order = g.permutation(self.size) if self.shuffle else np.arange(self.size)
            yield from order[self.rank::self.world_size].tolist()


class DefaultSampler:
    """One epoch, optionally shuffled; pads to a multiple of world_size."""

    def __init__(self, size: int, shuffle: bool = False, seed: int = 0,
                 rank: int = 0, world_size: int = 1):
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        order = (np.random.default_rng(self.seed).permutation(self.size)
                 if self.shuffle else np.arange(self.size))
        yield from order[self.rank::self.world_size].tolist()

    def __len__(self) -> int:
        return (self.size - self.rank + self.world_size - 1) // self.world_size


def _pad_stack(arrs: List[np.ndarray], pad_val: int) -> np.ndarray:
    """Stack, bottom/right-padding smaller samples to the batch max — the
    reference pads per-sample in SegDataPreProcessor (``base.py:68-96``);
    here the host collate does it so device batches stay static-shaped.
    Hit when an aggressive down-ratio leaves a sample below crop_size."""
    shapes = {a.shape for a in arrs}
    if len(shapes) == 1:
        return np.stack(arrs)
    max_h = max(a.shape[0] for a in arrs)
    max_w = max(a.shape[1] for a in arrs)
    padded = []
    for a in arrs:
        pad = [(0, max_h - a.shape[0]), (0, max_w - a.shape[1])]
        pad += [(0, 0)] * (a.ndim - 2)
        padded.append(np.pad(a, pad, constant_values=pad_val))
    return np.stack(padded)


def collate(items: List[Dict]) -> Dict[str, Any]:
    """Stack samples; keep metas as a list. Smaller samples are padded to
    the batch max (images with 0, labels with 255)."""
    batch: Dict[str, Any] = {}
    if 'tta_views' in items[0]:
        # TTA: bs=1, views carry their own inputs/metas
        assert len(items) == 1, 'TTA requires batch_size=1'
        views = items[0]['tta_views']
        return dict(tta_views=views,
                    metainfo=[views[0]['metainfo']] if views else [{}],
                    gt_seg_map=(np.stack([views[0]['gt_seg_map']])
                                if 'gt_seg_map' in views[0] else None))
    batch['inputs'] = _pad_stack([it['inputs'] for it in items], 0)
    if 'gt_seg_map' in items[0]:
        batch['gt_seg_map'] = _pad_stack([it['gt_seg_map'] for it in items],
                                         255)
    if 'gt_edge_map' in items[0]:
        batch['gt_edge_map'] = _pad_stack([it['gt_edge_map'] for it in items],
                                          255)
    batch['metainfo'] = [it['metainfo'] for it in items]
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, num_workers: int = 2,
                 sampler: Optional[Any] = None, drop_last: bool = False,
                 prefetch: int = 4, infinite: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.sampler = sampler
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.infinite = infinite

    def __len__(self) -> int:
        n = len(self.sampler) if hasattr(self.sampler, '__len__') else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self) -> Iterator[List[int]]:
        it = iter(self.sampler) if self.sampler is not None \
            else iter(range(len(self.dataset)))
        while True:
            idx = list(itertools.islice(it, self.batch_size))
            if not idx:
                return
            if len(idx) < self.batch_size and self.drop_last:
                return
            yield idx

    def __iter__(self) -> Iterator[Dict]:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        out_q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def produce():
            try:
                futures = []
                for idx in self._index_batches():
                    fut = [pool.submit(self.dataset.__getitem__, i) for i in idx]
                    futures.append(fut)
                    if len(futures) >= self.prefetch:
                        ready = futures.pop(0)
                        out_q.put(collate([f.result() for f in ready]))
                for fut in futures:
                    out_q.put(collate([f.result() for f in fut]))
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass  # interpreter teardown: queue module may be gone


def build_dataloader(cfg: Dict, rank: int = 0, world_size: int = 1,
                     seed: int = 0, default_batch_size: Optional[int] = None
                     ) -> DataLoader:
    """Build a DataLoader from an mmseg-style dataloader config dict
    (batch_size / num_workers / sampler / dataset keys)."""
    cfg = dict(cfg)
    dataset = DATASETS.build(dict(cfg['dataset']))
    batch_size = cfg.get('batch_size', default_batch_size or 1)
    num_workers = cfg.get('num_workers', 2)
    sampler_cfg = dict(cfg.get('sampler', dict(type='DefaultSampler')))
    stype = sampler_cfg.pop('type', 'DefaultSampler')
    shuffle = sampler_cfg.pop('shuffle', False)
    if stype == 'InfiniteSampler':
        sampler = InfiniteSampler(len(dataset), shuffle=shuffle, seed=seed,
                                  rank=rank, world_size=world_size)
        infinite = True
    else:
        sampler = DefaultSampler(len(dataset), shuffle=shuffle, seed=seed,
                                 rank=rank, world_size=world_size)
        infinite = False
    return DataLoader(dataset, batch_size=batch_size, num_workers=num_workers,
                      sampler=sampler, infinite=infinite,
                      drop_last=cfg.get('drop_last', False))


def prefetch_to_device(iterator: Iterator[Dict], mesh, depth: int = 2,
                       axis_name: str = 'data') -> Iterator[Dict]:
    """Overlap host->device transfer with device compute.

    The train loop's ``shard_batch(jnp.asarray(batch))`` is a synchronous
    H2D copy on the main thread: while it runs, the previously dispatched
    train step is the only thing keeping the chip busy, and for fast steps
    the copy becomes the bubble. This wraps a host-batch iterator in a
    background thread that device-puts up to ``depth`` batches ahead with
    the batch axis sharded over ``mesh`` (same placement as
    ``parallel.mesh.shard_batch``), the standard JAX input-pipeline
    pattern (cf. flax's ``jax_utils.prefetch_to_device``) generalized to a
    GSPMD sharding instead of pmap's leading device axis.

    Yields pytrees of committed device arrays in the iterator's order;
    re-raises loader/transfer errors on the consumer thread.
    """
    import jax
    from lednet_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh, axis_name)
    out_q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, depth))
    SENTINEL = object()

    def produce():
        try:
            for batch in iterator:
                dev = {k: jax.device_put(np.asarray(v), sharding)
                       for k, v in batch.items()
                       if isinstance(v, np.ndarray)}
                rest = {k: v for k, v in batch.items() if k not in dev}
                out_q.put({**dev, **rest})
        except BaseException as e:
            out_q.put(e)
        finally:
            out_q.put(SENTINEL)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = out_q.get()
        if item is SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
