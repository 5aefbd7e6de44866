from lednet_tpu.models.losses.cross_entropy import (CrossEntropyLoss,
                                                    OhemCrossEntropy, accuracy)

__all__ = ['CrossEntropyLoss', 'OhemCrossEntropy', 'accuracy']
