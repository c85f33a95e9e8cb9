from .proto import parse_sequence, decode_message
from .helpers import load_annotation_sequence, get_frame_annotation, grab_frames
from .objectron_to_coco import convert, load_video_info, keypoints_to_bbox

__all__ = ['parse_sequence', 'decode_message', 'load_annotation_sequence',
           'get_frame_annotation', 'grab_frames', 'convert',
           'load_video_info', 'keypoints_to_bbox']
