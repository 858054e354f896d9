"""Data layer: datasets, samplers, transforms, loaders."""

from . import datasets, samplers, transforms
from .datasets import ImageDataset, SyntheticDataset, select
from .loader import DataLoader, build_dataset
