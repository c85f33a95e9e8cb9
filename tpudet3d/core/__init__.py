from .cache import enable_compile_cache
from .config import AttrDict, read_py_config, check_isfile, merge_cli_overrides
from .logging import Logger, mkdir_if_missing
from .meters import AverageMeter, TextTable
from .prng import set_random_seed, KeySeq

OBJECTRON_CLASSES = ('bike', 'book', 'bottle', 'cereal_box', 'camera',
                     'chair', 'cup', 'laptop', 'shoe')
# The external detector config orders camera/cereal_box differently
# (reference configs/detection/mnv2_ssd_300_2_heads.py:4).  We keep both
# orders explicit so the two-stage pipeline can translate labels instead of
# silently mismatching (SURVEY.md §8.1).
DETECTOR_CLASSES = ('bike', 'book', 'bottle', 'camera', 'cereal_box',
                    'chair', 'cup', 'laptop', 'shoe')
DETECTOR_TO_REGRESSOR_CLS = tuple(OBJECTRON_CLASSES.index(c) for c in DETECTOR_CLASSES)

__all__ = [
    'enable_compile_cache',
    'AttrDict', 'read_py_config', 'check_isfile', 'merge_cli_overrides',
    'Logger', 'mkdir_if_missing', 'AverageMeter', 'TextTable',
    'set_random_seed', 'KeySeq',
    'OBJECTRON_CLASSES', 'DETECTOR_CLASSES', 'DETECTOR_TO_REGRESSOR_CLS',
]
