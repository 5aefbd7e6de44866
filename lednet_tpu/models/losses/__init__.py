from lednet_tpu.models.losses.cross_entropy import (CrossEntropyLoss,
                                                    OhemCrossEntropy, accuracy)
from lednet_tpu.models.losses.extra_losses import (BoundaryLoss, DiceLoss,
                                                   HuasdorffDisstanceLoss,
                                                   FocalLoss, KLDivLoss,
                                                   LovaszLoss, SiLogLoss,
                                                   TverskyLoss)

__all__ = ['CrossEntropyLoss', 'OhemCrossEntropy', 'accuracy', 'BoundaryLoss',
           'DiceLoss', 'FocalLoss', 'HuasdorffDisstanceLoss', 'KLDivLoss', 'LovaszLoss', 'SiLogLoss',
           'TverskyLoss']
