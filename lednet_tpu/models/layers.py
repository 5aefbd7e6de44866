"""Core NN bricks: ConvModule, norm/act builders, residual blocks.

TPU-native re-design of mmcv's ``ConvModule`` contract (conv+norm+act with a
configurable ``order``) and of the fork's block library
(``/root/reference/mmseg/models/utils/basic_block.py:13-221``). Everything is
NHWC flax.linen; BatchNorm relies on GSPMD to insert cross-replica collectives
when the batch axis is sharded, which reproduces the reference's SyncBN
semantics (``configs/LED_Net/LEDNet_80k_cityscapes-1024x1024.py:20``) without
an explicit SyncBN implementation.
"""
from __future__ import annotations

import functools

from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

_Size = Union[int, Tuple[int, int]]

# kaiming-normal fan_out (relu), matching mmcv's default conv init and the
# explicit init in the reference heads (led_head.py:53-60).
kaiming_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


def _pair(v: _Size) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(num_parameters=C)``)."""
    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param('alpha', nn.initializers.constant(self.init),
                           (self.num_parameters,), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def build_activation(act_cfg: Optional[Dict], channels: Optional[int] = None,
                     name: Optional[str] = None):
    """Return an activation callable (or flax module for parametric ones).

    Mirrors mmcv ``build_activation_layer``; ``act_cfg=None`` means identity.
    """
    from collections.abc import Mapping
    if act_cfg is None:
        return lambda x: x
    act_type = act_cfg['type'] if isinstance(act_cfg, Mapping) else act_cfg
    if act_type == 'ReLU':
        return nn.relu
    if act_type == 'ReLU6':
        return lambda x: jnp.clip(x, 0, 6)
    if act_type == 'LeakyReLU':
        slope = act_cfg.get('negative_slope', 0.01) if isinstance(act_cfg, Mapping) else 0.01
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if act_type == 'PReLU':
        return PReLU(num_parameters=channels or 1, name=name)
    if act_type == 'Sigmoid':
        return nn.sigmoid
    if act_type == 'GELU':
        return functools.partial(nn.gelu, approximate=False)
    if act_type == 'SiLU' or act_type == 'Swish':
        return nn.silu
    if act_type == 'Hardswish':
        return nn.hard_swish
    if act_type == 'Tanh':
        return nn.tanh
    raise ValueError(f'Unsupported activation: {act_type}')


class BatchNorm(nn.Module):
    """BatchNorm with exact torch running-stat semantics.

    Differs from ``flax.linen.BatchNorm`` in one way that matters for
    training parity with the reference (torch ``nn.BatchNorm2d``): torch
    normalizes with the *biased* batch variance but updates ``running_var``
    with the *unbiased* one (Bessel ``n/(n-1)`` correction); flax updates
    with the biased variance. The divergence is invisible at train time but
    shifts every eval-mode forward after training — exactly the silent-drift
    class the lockstep parity test (``tests/test_train_parity.py``) pins.

    Variable tree matches flax ``nn.BatchNorm`` (params ``scale``/``bias``,
    batch_stats ``mean``/``var``) so checkpoints and the mmseg2jax converter
    are unaffected. Under pjit/GSPMD a batch-sharded ``jnp.mean`` is a
    cross-replica mean, so SyncBN semantics fall out of the sharding; the
    Bessel count uses the *global* (logical) element count, matching
    torch SyncBN's all-reduced count.
    """
    use_running_average: bool = False
    momentum: float = 0.9  # flax convention: new = m*old + (1-m)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (x.shape[-1],)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(shape, jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones(shape, jnp.float32))
        scale = self.param('scale', nn.initializers.ones, shape, jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, shape, jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            # two-pass variance: exact match of torch's E[(x-mean)^2]
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = x.size // x.shape[-1]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


class Norm2d(nn.Module):
    """Normalization layer selected by mmseg-style ``norm_cfg``.

    ``BN``/``SyncBN`` both map to BatchNorm — under pjit/GSPMD a batch-sharded
    mean IS a cross-replica mean, so SyncBN falls out of the sharding, not a
    special layer. torch momentum 0.1 == flax momentum 0.9.
    """
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.norm_cfg or dict(type='BN')
        norm_type = cfg.get('type', 'BN')
        if norm_type in ('BN', 'SyncBN', 'BN2d'):
            mom = cfg.get('momentum', 0.1)
            return BatchNorm(
                use_running_average=not train,
                momentum=1.0 - mom,
                epsilon=cfg.get('eps', 1e-5),
                name='bn')(x)
        if norm_type == 'GN':
            groups = cfg.get('num_groups', 32)
            channels = x.shape[-1]
            while channels % groups:
                groups //= 2  # clamp to a divisor for narrow test widths
            return nn.GroupNorm(num_groups=max(groups, 1),
                                epsilon=cfg.get('eps', 1e-5), name='gn')(x)
        if norm_type == 'LN':
            return nn.LayerNorm(epsilon=cfg.get('eps', 1e-5), name='ln')(x)
        if norm_type == 'IN':
            return nn.GroupNorm(num_groups=None, group_size=1,
                                epsilon=cfg.get('eps', 1e-5), name='in')(x)
        raise ValueError(f'Unsupported norm type: {norm_type}')


class ConvModule(nn.Module):
    """conv + norm + act with configurable order, mmcv-``ConvModule``-shaped.

    The LED/DDR heads use ``order=('norm','act','conv')`` (pre-activation,
    reference ``led_head.py:84-99``, ``ppm.py:42-43``); backbones use the
    default ``('conv','norm','act')``.
    """
    in_channels: int
    out_channels: int
    kernel_size: _Size
    stride: _Size = 1
    padding: _Size = 0
    dilation: _Size = 1
    groups: int = 1
    bias: Union[bool, str] = 'auto'
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    order: Tuple[str, ...] = ('conv', 'norm', 'act')

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.bias if isinstance(self.bias, bool) else (self.norm_cfg is None)
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        dh, dw = _pair(self.dilation)
        conv = nn.Conv(
            features=self.out_channels,
            kernel_size=(kh, kw),
            strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            kernel_dilation=(dh, dw),
            feature_group_count=self.groups,
            use_bias=use_bias,
            kernel_init=kaiming_init,
            name='conv')
        act_channels = self.out_channels if 'act' in self.order and \
            self.order.index('act') > self.order.index('conv') else self.in_channels

        for layer in self.order:
            if layer == 'conv':
                x = conv(x)
            elif layer == 'norm' and self.norm_cfg is not None:
                x = Norm2d(self.norm_cfg, name='norm')(x, train=train)
            elif layer == 'act' and self.act_cfg is not None:
                x = build_activation(self.act_cfg, act_channels, name='act')(x)
        return x


class BasicBlock(nn.Module):
    """ResNet basic block (reference ``basic_block.py:13-75``)."""
    in_channels: int
    channels: int
    stride: int = 1
    downsample: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    act_out: bool = True
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        residual = x
        out = ConvModule(self.in_channels, self.channels, 3, stride=self.stride,
                         padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='conv1')(x, train=train)
        out = ConvModule(self.channels, self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=None,
                         name='conv2')(out, train=train)
        if self.downsample:
            residual = nn.Conv(self.channels * self.expansion, (1, 1),
                               strides=_pair(self.stride), use_bias=False,
                               kernel_init=kaiming_init, name='downsample_conv')(x)
            residual = Norm2d(norm_cfg, name='downsample_norm')(residual, train=train)
        out = out + residual
        if self.act_out:
            out = nn.relu(out)
        return out


class Bottleneck(nn.Module):
    """ResNet bottleneck block (reference ``basic_block.py:156-221``)."""
    in_channels: int
    channels: int
    stride: int = 1
    downsample: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    act_out: bool = False
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        residual = x
        out = ConvModule(self.in_channels, self.channels, 1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='conv1')(x, train=train)
        out = ConvModule(self.channels, self.channels, 3, stride=self.stride,
                         padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='conv2')(out, train=train)
        out = ConvModule(self.channels, self.channels * self.expansion, 1,
                         norm_cfg=norm_cfg, act_cfg=None, name='conv3')(out, train=train)
        if self.downsample:
            residual = nn.Conv(self.channels * self.expansion, (1, 1),
                               strides=_pair(self.stride), use_bias=False,
                               kernel_init=kaiming_init, name='downsample_conv')(x)
            residual = Norm2d(norm_cfg, name='downsample_norm')(residual, train=train)
        out = out + residual
        if self.act_out:
            out = nn.relu(out)
        return out


def drop_path_rates(drop_path_rate: float, depths) -> list:
    """Per-block stochastic-depth rates, linearly scaled over the total
    depth (torch ``linspace(0, rate, sum(depths))``)."""
    total = sum(depths)
    return [drop_path_rate * i / max(total - 1, 1) for i in range(total)]


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm ``DropPath``, used by the
    reference's transformer backbones via mmcv). Scales the kept residual
    branch by 1/keep_prob; identity when ``rate == 0`` or at eval."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng('dropout'), keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


class BasicBlockHalf(nn.Module):
    """Fork-added stem tap block: 3x3 s1 + 3x3 s2, halves resolution
    (reference ``basic_block.py:78-115`` ``BasicBlock_1``)."""
    in_channels: int
    channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = ConvModule(self.in_channels, self.channels, 3, stride=1, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg, name='conv1')(x, train=train)
        x = ConvModule(self.channels, self.channels, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=None, name='conv2')(x, train=train)
        return x


class BasicBlockQuarter(nn.Module):
    """Fork-added stem tap block: two stride-2 convs, quarters resolution
    (reference ``basic_block.py:117-154`` ``BasicBlock_2``)."""
    in_channels: int
    channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = ConvModule(self.in_channels, self.channels, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg, name='conv1')(x, train=train)
        x = ConvModule(self.channels, self.channels, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=None, name='conv2')(x, train=train)
        return x
