from .dataset import Objectron, SyntheticObjectron
from .detection_dataset import DetectionDataset, SyntheticDetection
from .loader import BatchLoader, build_loader
from .transforms import build_augmentations, TRANSFORMS_REGISTRY
from .det_transforms import build_detector_augmentations

__all__ = ['Objectron', 'SyntheticObjectron', 'DetectionDataset',
           'SyntheticDetection', 'BatchLoader', 'build_loader',
           'build_augmentations', 'TRANSFORMS_REGISTRY',
           'build_detector_augmentations']
