from .metrics import (compute_average_distance, compute_accuracy,
                      compute_metrics_per_cls, compute_2d_based_iou,
                      add_sadd_per_sample)
from .evaluator import Evaluator
from .protocol import (HitMiss, AveragePrecision, ObjectronProtocolEvaluator,
                       read_tfrecord, parse_example, compute_scale,
                       compute_viewpoint, viewpoint_errors, match_box)

__all__ = ['compute_average_distance', 'compute_accuracy',
           'compute_metrics_per_cls', 'compute_2d_based_iou',
           'add_sadd_per_sample', 'Evaluator', 'HitMiss', 'AveragePrecision',
           'ObjectronProtocolEvaluator', 'read_tfrecord', 'parse_example',
           'compute_scale', 'compute_viewpoint', 'viewpoint_errors',
           'match_box']
