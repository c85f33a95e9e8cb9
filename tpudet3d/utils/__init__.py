from .checkpoint import (save_snap, resume_from, load_pretrained_weights,
                         latest_snapshot, snapshot_path, merge_matching)
from .drawing import (EDGES, draw_kp, draw_boxes, normalize_kp,
                      unnormalize_kp, unnormalize_img)
from .profiling import trace, StepTimer, flops_of, annotate
from .hpo import create_study, TrialPruned

__all__ = ['save_snap', 'resume_from', 'load_pretrained_weights',
           'latest_snapshot', 'snapshot_path', 'merge_matching',
           'EDGES', 'draw_kp', 'draw_boxes', 'normalize_kp', 'unnormalize_kp',
           'unnormalize_img', 'trace', 'StepTimer', 'flops_of', 'annotate',
           'create_study', 'TrialPruned']
