from .datasets import (ArrayDataset, CIFAR10Dataset, InterHand26MDataset,
                       MNISTDataset, OxfordFlowersDataset, SyntheticDataset)
from .pipeline import DataLoader, load_dataloader, prefetch_to_device
from .transforms import Preprocessor, denormalize, normalize, resize, to_float

__all__ = [
    "ArrayDataset", "CIFAR10Dataset", "InterHand26MDataset", "MNISTDataset",
    "OxfordFlowersDataset", "SyntheticDataset", "DataLoader", "load_dataloader",
    "prefetch_to_device", "Preprocessor", "denormalize", "normalize", "resize",
    "to_float",
]
