from lednet_tpu.datasets.basesegdataset import (ADE20KDataset, BaseSegDataset,
                                                CityscapesDataset, Compose,
                                                PascalVOCDataset)
from lednet_tpu.datasets.loader import (DataLoader, DefaultSampler,
                                        InfiniteSampler, build_dataloader,
                                        collate)
from lednet_tpu.datasets.more_datasets import *  # noqa: F401,F403
from lednet_tpu.datasets.transforms import *  # noqa: F401,F403
