from .geometry import (EPNP_ALPHA, get_default_camera_matrix,
                       project_3d_points, convert_camera_matrix_2_ndc,
                       convert_2d_to_ndc, lift_2d, lift_2d_batched)
from .box3d import (iou_oriented_boxes, pairwise_iou_oriented_boxes,
                    box_axes, box_volume, iou_single_host)

__all__ = [
    'EPNP_ALPHA', 'get_default_camera_matrix', 'project_3d_points',
    'convert_camera_matrix_2_ndc', 'convert_2d_to_ndc', 'lift_2d',
    'lift_2d_batched', 'iou_oriented_boxes', 'pairwise_iou_oriented_boxes',
    'box_axes', 'box_volume', 'iou_single_host',
]
