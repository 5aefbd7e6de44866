"""A trivial extension backbone demonstrating the registry contract."""
from typing import Optional

import flax.linen as nn

from lednet_tpu.models.backbones.resnet import ResNet
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class DummyResNet(ResNet):
    """ResNet that proves extension registration works (analogue of the
    reference's ``projects/example_project/dummy/dummy_resnet.py``)."""

    def __call__(self, x, train: bool = False):
        outs = super().__call__(x, train=train)
        return outs
