from .dataset import Objectron, SyntheticObjectron
from .loader import BatchLoader, build_loader
from .transforms import build_augmentations, TRANSFORMS_REGISTRY

__all__ = ['Objectron', 'SyntheticObjectron', 'BatchLoader', 'build_loader',
           'build_augmentations', 'TRANSFORMS_REGISTRY']
