"""Loss registry/factory (reference torchdet3d/builders/loss_builder.py)."""

from functools import partial

from .regression import (l1_loss, smooth_l1_loss, mse_loss, add_loss,
                         diag_loss, wing_loss, cross_entropy_loss)

AVAILABLE_LOSS = ['smoothl1', 'l1', 'cross_entropy', 'diag_loss', 'mse',
                  'add_loss', 'wing']

__all__ = ['build_loss', 'AVAILABLE_LOSS']


def build_loss(cfg):
    """Build (regression criterions, classification criterions) in config
    order (reference loss_builder.py:7-28)."""
    regress_criterions = []
    class_criterions = []
    for loss_name in cfg.loss.names:
        assert loss_name in AVAILABLE_LOSS, f'unknown loss {loss_name}'
        if loss_name == 'cross_entropy':
            class_criterions.append(cross_entropy_loss)
        elif loss_name == 'smoothl1':
            regress_criterions.append(
                partial(smooth_l1_loss, beta=float(cfg.loss.smoothl1_beta)))
        elif loss_name == 'l1':
            regress_criterions.append(l1_loss)
        elif loss_name == 'mse':
            regress_criterions.append(mse_loss)
        elif loss_name == 'wing':
            regress_criterions.append(
                partial(wing_loss, w=float(cfg.loss.w), eps=float(cfg.loss.eps)))
        elif loss_name == 'add_loss':
            regress_criterions.append(add_loss)
        elif loss_name == 'diag_loss':
            regress_criterions.append(diag_loss)
    return regress_criterions, class_criterions
