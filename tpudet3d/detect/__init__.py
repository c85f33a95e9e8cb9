from .anchors import (generate_anchors, num_anchors_per_level, STRIDES,
                      CLUSTERED_WIDTHS, CLUSTERED_HEIGHTS, INPUT_SIZE)
from .coder import encode_boxes, decode_boxes, DEFAULT_STDS
from .assigner import iou_xyxy, assign_anchors
from .ssd import SSDDetector
from .losses import ssd_loss
from .nms import greedy_nms, soft_nms, decode_detections
from .eval import DetectorEvaluator, average_precision

__all__ = ['generate_anchors', 'num_anchors_per_level', 'STRIDES',
           'CLUSTERED_WIDTHS', 'CLUSTERED_HEIGHTS', 'INPUT_SIZE',
           'encode_boxes', 'decode_boxes', 'DEFAULT_STDS', 'iou_xyxy',
           'assign_anchors', 'SSDDetector', 'ssd_loss', 'greedy_nms',
           'soft_nms',
           'decode_detections', 'DetectorEvaluator', 'average_precision']
