"""Runner: config -> components -> train/val/test loops.

TPU-native re-design of the mmengine Runner path the reference uses
(``tools/train.py:60-106`` -> ``Runner.from_cfg`` -> ``IterBasedTrainLoop``;
SURVEY.md §3.1/§3.2). One SPMD mesh replaces DDP launch/NCCL; the train step
is a single jitted program (gradients, SyncBN and preprocessing fused); val
runs the jitted predict path + IoUMetric with on-device histograms.
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.config import Config
from lednet_tpu.datasets.loader import build_dataloader
from lednet_tpu.engine.checkpoint import (find_latest_checkpoint,
                                          load_checkpoint, save_checkpoint)
from lednet_tpu.engine.loggers import ScalarLogger
from lednet_tpu.engine.optim import build_optimizer
from lednet_tpu.engine.state import (TrainState, create_train_state,
                                     make_eval_step, make_train_step)
from lednet_tpu.evaluation.iou_metric import IoUMetric
from lednet_tpu.models.segmentors.encoder_decoder import postprocess_logits
from lednet_tpu.parallel.mesh import make_mesh, shard_batch
from lednet_tpu.registry import DATASETS, METRICS, MODELS


class Runner:
    def __init__(self, cfg: Config, work_dir: Optional[str] = None,
                 devices=None, seed: int = 0):
        self.cfg = cfg
        self.work_dir = work_dir or cfg.get('work_dir') or './work_dirs/run'
        os.makedirs(self.work_dir, exist_ok=True)
        self.seed = seed

        self.mesh = make_mesh(devices)
        self.n_devices = len(list(self.mesh.devices.flat))

        model_cfg = cfg.model.to_dict() if hasattr(cfg.model, 'to_dict') \
            else dict(cfg.model)
        pre_cfg = model_cfg.get('data_preprocessor') or cfg.get('data_preprocessor')
        self.preprocessor = MODELS.build(dict(pre_cfg)) if pre_cfg else None
        self.model = MODELS.build(model_cfg)
        self.test_mode = (model_cfg.get('test_cfg') or {}).get('mode', 'whole')

        self.logger = ScalarLogger(self.work_dir)
        self.state: Optional[TrainState] = None

    # ------------------------------------------------------------------ train
    def train(self, resume: bool = False):
        cfg = self.cfg
        # preemption safety (SURVEY §5.3: new capability vs the reference):
        # SIGTERM/SIGINT trigger a checkpoint save before exit, so TPU
        # preemptions resume cleanly with --resume
        import signal
        preempted = {'flag': False}

        def _on_term(signum, frame):
            preempted['flag'] = True
        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:
                pass  # non-main thread

        train_cfg = cfg.get('train_cfg', {}) or {}
        max_iters = train_cfg.get('max_iters', 80000)
        val_interval = train_cfg.get('val_interval', 0)
        hooks = cfg.get('default_hooks', {}) or {}
        log_interval = (hooks.get('logger') or {}).get('interval', 50)
        ckpt_interval = (hooks.get('checkpoint') or {}).get('interval', 5000)

        # per-device batch size from config scales to the mesh (mmseg's
        # batch_size is per-GPU; ours is per-device on the data mesh axis)
        per_dev_bs = cfg.train_dataloader.get('batch_size', 2)
        # multi-host SPMD: each process loads its local shard of the global
        # batch (round-robin over jax.process_index, replacing the
        # reference's DistSamplerSeedHook/rank sharding)
        local_devices = max(self.n_devices // jax.process_count(), 1)
        global_bs = per_dev_bs * local_devices
        loader_cfg = dict(cfg.train_dataloader)
        loader_cfg['batch_size'] = global_bs
        train_loader = build_dataloader(loader_cfg, seed=self.seed,
                                        rank=jax.process_index(),
                                        world_size=jax.process_count())
        self.dataset_meta = train_loader.dataset.metainfo

        tx, lr_schedule = build_optimizer(cfg.get('optim_wrapper'),
                                          cfg.get('param_scheduler'))
        train_step = make_train_step(self.model, tx, self.preprocessor,
                                     rng=jax.random.PRNGKey(self.seed),
                                     amp=bool(cfg.get('bf16', False)))

        # init on an example batch
        data_iter = iter(train_loader)
        batch = next(data_iter)
        init_inputs, init_labels, _ = self._pre(batch, training=True)
        if self.state is None:
            self.state = create_train_state(
                self.model, tx,
                dict(inputs=init_inputs, gt_seg_map=init_labels),
                rng=jax.random.PRNGKey(self.seed))
        if resume:
            latest = find_latest_checkpoint(self.work_dir)
            if latest:
                self.state, meta = load_checkpoint(latest, self.state)
                print(f'resumed from {latest} (iter {meta.get("iter")})')

        # overlap H2D with compute: a background thread device-puts up to
        # `device_prefetch` batches ahead (sharded over the mesh), so the
        # main thread never blocks on the copy (loader.prefetch_to_device)
        from lednet_tpu.datasets.loader import prefetch_to_device
        depth = int(cfg.get('device_prefetch', 2))
        if depth > 0:
            data_iter = prefetch_to_device(data_iter, self.mesh, depth=depth)

        start = int(jax.device_get(self.state.step))
        t_last = time.time()
        for it in range(start, max_iters):
            if preempted['flag']:
                path = save_checkpoint(
                    self.work_dir, self.state,
                    meta=dict(dataset_meta=_json_meta(self.dataset_meta),
                              preempted=True))
                print(f'preempted: saved {path}; resume with --resume',
                      flush=True)
                for sig, h in old_handlers.items():
                    signal.signal(sig, h)
                return self.state
            if it > start:
                batch = next(data_iter)
            # prefetched batches are already committed device arrays with
            # the right sharding; device_put is then a no-op passthrough
            inputs = shard_batch(jnp.asarray(batch['inputs']), self.mesh)
            if 'gt_edge_map' in batch:
                labels = shard_batch(
                    dict(gt_seg_map=jnp.asarray(batch['gt_seg_map']),
                         gt_edge_map=jnp.asarray(batch['gt_edge_map'])),
                    self.mesh)
            else:
                labels = shard_batch(jnp.asarray(batch['gt_seg_map']), self.mesh)
            self.state, logs = train_step(self.state, inputs, labels)

            step = it + 1
            if step % log_interval == 0 or step == max_iters:
                logs = jax.device_get(logs)
                dt = (time.time() - t_last) / log_interval
                t_last = time.time()
                lr = lr_schedule(step)
                self.logger.log(step, logs)
                self.logger.console(step, max_iters, logs, lr=lr, iter_time=dt)
            if ckpt_interval and step % ckpt_interval == 0:
                save_checkpoint(self.work_dir, self.state,
                                meta=dict(dataset_meta=_json_meta(self.dataset_meta)))
            if val_interval and step % val_interval == 0 and 'val_dataloader' in self.cfg:
                metrics = self.val()
                self.logger.log(step, metrics, prefix='val/')
                print(f'val @ {step}: {metrics}', flush=True)

        save_checkpoint(self.work_dir, self.state,
                        meta=dict(dataset_meta=_json_meta(self.dataset_meta)))
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        return self.state

    # ---------------------------------------------------------------- val/test
    def val(self, loader_key: str = 'val_dataloader',
            evaluator_key: str = 'val_evaluator') -> Dict[str, float]:
        cfg = self.cfg
        loader = build_dataloader(dict(cfg[loader_key]), seed=self.seed)
        metainfo = loader.dataset.metainfo
        num_classes = len(metainfo.get('classes', [])) or 2
        metric_cfg = dict(cfg.get(evaluator_key) or dict(type='IoUMetric'))
        metric = METRICS.build(metric_cfg)
        metric.class_names = metainfo.get('classes')

        # one jitted program per (mode): cached across val() calls; arbitrary
        # val-image sizes pad to a BUCKET (next multiple of eval_pad_multiple,
        # SURVEY §7.4.6) so a heterogeneous val set compiles O(#buckets)
        # programs instead of one per distinct shape
        if not hasattr(self, '_eval_steps'):
            self._eval_steps = {}
        eval_step = self._eval_steps.get(self.test_mode)
        if eval_step is None:
            eval_step = make_eval_step(self.model, self.preprocessor,
                                       mode=self.test_mode)
            self._eval_steps[self.test_mode] = eval_step
        bucket = int(cfg.get('eval_pad_multiple', 128))
        # multi-chip eval: shard image rows over the mesh (GSPMD halo
        # exchanges make it numerically the single-device forward)
        spatial_shard = bool(cfg.get('val_spatial_shard')) and \
            self.n_devices > 1 and self.test_mode == 'whole'
        if spatial_shard and not hasattr(self, '_spatial_mesh'):
            self._spatial_mesh = make_mesh(axis_name='spatial')
        head_cfg = (self.cfg.model.get('decode_head') or {})
        out_channels = head_cfg.get('out_channels')
        threshold = head_cfg.get('threshold', 0.3) or 0.3

        def predict_one(inputs, meta, flip=False, flip_direction='horizontal'):
            """Jitted forward + postprocess to the original image frame."""
            pad_h = (-inputs.shape[1]) % bucket
            pad_w = (-inputs.shape[2]) % bucket
            if spatial_shard:
                from lednet_tpu.parallel.sharded_inference import \
                    sharded_predict
                logits = sharded_predict(
                    self.model,
                    {'params': self.state.params,
                     'batch_stats': self.state.batch_stats},
                    inputs, mesh=self._spatial_mesh,
                    preprocessor=self.preprocessor, multiple=bucket)
                pad_h = pad_w = 0  # sharded_predict returns unpadded logits
            else:
                if pad_h or pad_w:
                    inputs = jnp.pad(inputs,
                                     ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                logits = eval_step(self.state, inputs)
            extra_h = logits.shape[1] - (inputs.shape[1] - pad_h)
            extra_w = logits.shape[2] - (inputs.shape[2] - pad_w)
            return postprocess_logits(
                logits, (extra_h, extra_w),
                ori_shape=tuple(meta.get('ori_shape') or ()) or None,
                flip=flip, flip_direction=flip_direction,
                out_channels=out_channels, threshold=threshold)

        # SegVisualizationHook analogue: dump the first N prediction overlays
        vis_cfg = (self.cfg.get('default_hooks') or {}).get('visualization') or {}
        vis_draw = bool(vis_cfg.get('draw', False))
        vis_max = vis_cfg.get('max_samples', 8)
        vis_count = 0
        vis_dir = osp.join(self.work_dir, 'vis_data', 'vis_image')
        visualizer = None

        def draw_vis(img, pred_np):
            nonlocal vis_count, visualizer
            from lednet_tpu.visualization import SegLocalVisualizer
            import cv2
            os.makedirs(vis_dir, exist_ok=True)
            if visualizer is None:
                visualizer = SegLocalVisualizer()
            pred_np = pred_np.astype(np.uint8)
            if pred_np.shape != img.shape[:2]:  # pred is at ori_shape
                pred_np = cv2.resize(pred_np, (img.shape[1], img.shape[0]),
                                     interpolation=cv2.INTER_NEAREST)
            drawn = visualizer.draw_sem_seg(img, pred_np,
                                            metainfo.get('classes'),
                                            metainfo.get('palette'))
            cv2.imwrite(osp.join(vis_dir, f'val_{vis_count}.png'), drawn)
            vis_count += 1

        # Batched val (reference iterates bs=1 per rank; here same-shaped
        # images are stacked to val_batch_size and — when divisible — the
        # batch axis is sharded over the data mesh, so multi-chip eval is
        # data-parallel by default, complementing ``val_spatial_shard`` for
        # images too large for one chip): bucket by (input shape, ori
        # shape), one jitted forward + one batched postprocess per chunk.
        vb = max(1, int(cfg.get('val_batch_size', 8)))

        def flush(items):
            n = len(items)
            items = items + [items[-1]] * (vb - n)  # pad chunk: 1 program
            xs = np.stack([np.asarray(it['inputs']) for it in items])
            meta = items[0]['metainfo']
            pad_h = (-xs.shape[1]) % bucket
            pad_w = (-xs.shape[2]) % bucket
            arr = jnp.asarray(xs)
            if pad_h or pad_w:
                arr = jnp.pad(arr, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            if self.n_devices > 1 and vb % self.n_devices == 0:
                arr = shard_batch(arr, self.mesh)
            logits = eval_step(self.state, arr)
            extra_h = logits.shape[1] - xs.shape[1]
            extra_w = logits.shape[2] - xs.shape[2]
            _, pred = postprocess_logits(
                logits, (extra_h, extra_w),
                ori_shape=tuple(meta.get('ori_shape') or ()) or None,
                out_channels=out_channels, threshold=threshold)
            pred = pred[:n]
            labels = np.stack([np.asarray(it['gt_seg_map'])
                               for it in items[:n]])
            metric.process(pred, jnp.asarray(labels), num_classes)
            if vis_draw and vis_count < vis_max:
                pred_np = np.asarray(pred)
                for i in range(min(n, vis_max - vis_count)):
                    draw_vis(np.asarray(items[i]['inputs']), pred_np[i])

        pending: Dict[Any, list] = {}
        for batch in loader:
            if 'tta_views' in batch:
                from lednet_tpu.models.segmentors.seg_tta import merge_tta_probs
                view_logits = []
                for view in batch['tta_views']:
                    meta = view['metainfo']
                    logits, _ = predict_one(
                        jnp.asarray(view['inputs'])[None], meta,
                        flip=bool(meta.get('flip')),
                        flip_direction=meta.get('flip_direction') or 'horizontal')
                    view_logits.append(logits[0])
                _, pred = merge_tta_probs(view_logits, out_channels, threshold)
                metric.process(pred[None], jnp.asarray(batch['gt_seg_map']),
                               num_classes)
                if vis_draw and vis_count < vis_max:
                    draw_vis(np.asarray(batch['tta_views'][0]['inputs']),
                             np.asarray(pred))
                continue
            if spatial_shard:
                # per-image: the whole mesh is busy on each single image
                _, pred = predict_one(jnp.asarray(batch['inputs']),
                                      batch['metainfo'][0])
                metric.process(pred, jnp.asarray(batch['gt_seg_map']),
                               num_classes)
                if vis_draw and vis_count < vis_max:
                    draw_vis(np.asarray(batch['inputs'][0]),
                             np.asarray(pred[0]))
                continue
            for i, meta in enumerate(batch['metainfo']):
                item = dict(inputs=batch['inputs'][i],
                            gt_seg_map=batch['gt_seg_map'][i],
                            metainfo=meta)
                key = (tuple(np.shape(item['inputs'])),
                       tuple(meta.get('ori_shape') or ()))
                pending.setdefault(key, []).append(item)
                if len(pending[key]) == vb:
                    flush(pending.pop(key))
        for items in pending.values():
            flush(items)
        results = metric.compute_metrics()
        print(metric.table(), flush=True)
        return results

    def test(self, checkpoint: Optional[str] = None) -> Dict[str, float]:
        if checkpoint:
            self.load(checkpoint)
        assert self.state is not None, 'no weights: pass a checkpoint'
        key = 'test_dataloader' if 'test_dataloader' in self.cfg else 'val_dataloader'
        ekey = 'test_evaluator' if 'test_evaluator' in self.cfg else 'val_evaluator'
        return self.val(key, ekey)

    # ------------------------------------------------------------------- utils
    def init_state(self, sample_shape=(1, 64, 64, 3)):
        """Initialize weights without training (for test/demo entry points)."""
        tx, _ = build_optimizer(self.cfg.get('optim_wrapper'),
                                self.cfg.get('param_scheduler'))
        sample = dict(inputs=jnp.zeros(sample_shape, jnp.float32),
                      gt_seg_map=jnp.zeros(sample_shape[:3], jnp.int32))
        self.state = create_train_state(self.model, tx, sample,
                                        rng=jax.random.PRNGKey(self.seed))
        return self.state

    def load(self, checkpoint: str):
        if self.state is None:
            self.init_state()
        self.state, meta = load_checkpoint(checkpoint, self.state)
        self.ckpt_meta = meta
        return meta

    def _pre(self, batch, training: bool):
        inputs = jnp.asarray(batch['inputs'])
        labels = jnp.asarray(batch.get('gt_seg_map')) \
            if batch.get('gt_seg_map') is not None else None
        return inputs, labels, batch.get('metainfo')


def _json_meta(meta: Dict) -> Dict:
    out = {}
    for k, v in (meta or {}).items():
        if isinstance(v, (list, tuple)):
            out[k] = [list(x) if isinstance(x, (list, tuple)) else x for x in v]
        else:
            out[k] = v
    return out
