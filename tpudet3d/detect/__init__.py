from .anchors import (generate_anchors, num_anchors_per_level, STRIDES,
                      CLUSTERED_WIDTHS, CLUSTERED_HEIGHTS, INPUT_SIZE)
from .coder import encode_boxes, decode_boxes, DEFAULT_STDS, CASCADE_STDS
from .assigner import iou_xyxy, assign_anchors
from .ssd import SSDDetector
from .losses import ssd_loss, giou_xyxy_paired
from .nms import greedy_nms, soft_nms, decode_detections
from .eval import DetectorEvaluator, average_precision
from .load import load_detector

__all__ = ['generate_anchors', 'num_anchors_per_level', 'STRIDES',
           'CLUSTERED_WIDTHS', 'CLUSTERED_HEIGHTS', 'INPUT_SIZE',
           'encode_boxes', 'decode_boxes', 'DEFAULT_STDS', 'CASCADE_STDS',
           'iou_xyxy', 'assign_anchors', 'SSDDetector', 'ssd_loss',
           'giou_xyxy_paired', 'greedy_nms', 'soft_nms',
           'decode_detections', 'DetectorEvaluator', 'average_precision',
           'load_detector']
