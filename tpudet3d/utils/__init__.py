from .checkpoint import (save_snap, resume_from, load_pretrained_weights,
                         latest_snapshot, snapshot_path, merge_matching)
from .drawing import (EDGES, draw_kp, normalize_kp, unnormalize_kp,
                      unnormalize_img)

__all__ = ['save_snap', 'resume_from', 'load_pretrained_weights',
           'latest_snapshot', 'snapshot_path', 'merge_matching',
           'EDGES', 'draw_kp', 'normalize_kp', 'unnormalize_kp',
           'unnormalize_img']
