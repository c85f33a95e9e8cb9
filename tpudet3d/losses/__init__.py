from .regression import (l1_loss, smooth_l1_loss, mse_loss, add_loss,
                         diag_loss, wing_loss, cross_entropy_loss,
                         compute_diag, LOSS_REGISTRY)
from .manager import LossManager, AlwaState
from .builder import build_loss, AVAILABLE_LOSS

__all__ = ['l1_loss', 'smooth_l1_loss', 'mse_loss', 'add_loss', 'diag_loss',
           'wing_loss', 'cross_entropy_loss', 'compute_diag', 'LOSS_REGISTRY',
           'LossManager', 'AlwaState', 'build_loss', 'AVAILABLE_LOSS']
