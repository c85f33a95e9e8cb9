"""Weighted multi-loss combination with ALWA adaptive re-balancing.

The reference LossManager (torchdet3d/losses/regression_losses.py:60-115)
keeps Python lists of past loss values and mutates ``lam_cls`` on the host
every C iterations — that forces a device→host sync per step.  Here ALWA is
a pure state transition carried inside the jitted train step: running sums +
sums-of-squares replace the list (torch.std is unbiased, so
std² = (Σx² − (Σx)²/n)/(n−1)), and the update fires via ``lax.cond`` on
``iter % C == 0``.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ['AlwaState', 'LossManager']


@struct.dataclass
class AlwaState:
    lam_cls: jnp.ndarray
    lam_reg: jnp.ndarray
    sum_cls: jnp.ndarray
    sumsq_cls: jnp.ndarray
    sum_reg: jnp.ndarray
    sumsq_reg: jnp.ndarray
    count: jnp.ndarray


class LossManager:
    """Combines weighted regression + classification criterions.

    criterions: ([reg_fn...], [cls_fn...]) of pure (pred, target)->scalar.
    coefficients: ([reg coeffs], [cls coeffs]) — zipped in config order
    (reference regression_losses.py:62-65, SURVEY.md §8.7).
    """

    def __init__(self, criterions: Tuple[Sequence, Sequence],
                 coefficients: Tuple[Sequence, Sequence], alwa: Any):
        self.reg_criterions, self.class_criterions = criterions
        self.reg_coeffs, self.class_coeffs = coefficients
        assert len(self.reg_coeffs) == len(self.reg_criterions)
        assert len(self.class_coeffs) == len(self.class_criterions)
        assert self.reg_criterions
        self.use_alwa = bool(alwa.use) if alwa else False
        if self.use_alwa:
            assert self.class_criterions
            assert self.reg_coeffs[0] == self.class_coeffs[0] == 1.
        self.lam_cls0 = float(alwa.lam_cls) if self.use_alwa else 1.0
        self.lam_reg0 = float(alwa.lam_reg) if self.use_alwa else 1.0
        self.C = int(alwa.C) if self.use_alwa else 1
        self.compute_std = bool(alwa.compute_std) if self.use_alwa else False

    def init_state(self) -> AlwaState:
        # distinct arrays per field: donated buffers must not alias
        z = lambda: jnp.zeros((), jnp.float32)
        return AlwaState(lam_cls=jnp.float32(self.lam_cls0),
                         lam_reg=jnp.float32(self.lam_reg0),
                         sum_cls=z(), sumsq_cls=z(), sum_reg=z(), sumsq_reg=z(),
                         count=jnp.zeros((), jnp.int32))

    def parse_losses(self, pred_kp, gt_kp, pred_cats, gt_cats, iter_,
                     state: AlwaState):
        """Returns (total_loss, new_state).  Pure — safe inside jit."""
        reg_loss = sum(k * cr(pred_kp, gt_kp)
                       for k, cr in zip(self.reg_coeffs, self.reg_criterions))
        if self.class_criterions:
            cls_loss = sum(k * cr(pred_cats, gt_cats)
                           for k, cr in zip(self.class_coeffs, self.class_criterions))
        else:
            cls_loss = jnp.zeros((), pred_kp.dtype)

        if not self.use_alwa:
            return reg_loss + cls_loss, state

        s_cls = state.lam_cls * cls_loss
        s_reg = state.lam_reg * reg_loss
        acc = state.replace(sum_cls=state.sum_cls + s_cls,
                            sumsq_cls=state.sumsq_cls + s_cls * s_cls,
                            sum_reg=state.sum_reg + s_reg,
                            sumsq_reg=state.sumsq_reg + s_reg * s_reg,
                            count=state.count + 1)

        def do_update(st: AlwaState) -> AlwaState:
            n = st.count.astype(jnp.float32)
            mean_cls = st.sum_cls / n
            mean_reg = st.sum_reg / n
            if self.compute_std:  # 'ver_1'
                var_cls = (st.sumsq_cls - st.sum_cls ** 2 / n) / jnp.maximum(n - 1, 1)
                var_reg = (st.sumsq_reg - st.sum_reg ** 2 / n) / jnp.maximum(n - 1, 1)
                cls = mean_cls + jnp.sqrt(jnp.maximum(var_cls, 0))
                reg = mean_reg + jnp.sqrt(jnp.maximum(var_reg, 0))
            else:                 # 'ver_2'
                cls, reg = mean_cls, mean_reg
            new_lam = jnp.where(cls > reg, 1.0 - (cls - reg) / cls, st.lam_cls)
            z = jnp.zeros((), jnp.float32)
            return st.replace(lam_cls=new_lam, sum_cls=z, sumsq_cls=z,
                              sum_reg=z, sumsq_reg=z,
                              count=jnp.zeros((), jnp.int32))

        iter_ = jnp.asarray(iter_)
        fire = jnp.logical_and(iter_ % self.C == 0, iter_ != 0)
        new_state = jax.lax.cond(fire, do_update, lambda s: s, acc)
        # the reference applies the just-updated lam_cls to this step's loss
        # (regression_losses.py:111-115)
        total = new_state.lam_reg * reg_loss + new_state.lam_cls * cls_loss
        return total, new_state

    # convenience alias
    __call__ = parse_losses
