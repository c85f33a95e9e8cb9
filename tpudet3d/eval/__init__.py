from .metrics import (compute_average_distance, compute_accuracy,
                      compute_metrics_per_cls, compute_2d_based_iou,
                      add_sadd_per_sample)

__all__ = ['compute_average_distance', 'compute_accuracy',
           'compute_metrics_per_cls', 'compute_2d_based_iou',
           'add_sadd_per_sample']
