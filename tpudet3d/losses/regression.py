"""Keypoint-regression and classification losses as pure jnp functions.

Math parity with the reference (torchdet3d/losses/regression_losses.py),
re-expressed functionally: every loss is ``f(pred, target) -> scalar`` and
differentiates cleanly under ``jax.grad`` (the reference WingLoss mutates
tensors in place, :34-42; here it is a branch-free ``where``).
"""

import jax
import jax.numpy as jnp

__all__ = ['l1_loss', 'smooth_l1_loss', 'mse_loss', 'add_loss', 'diag_loss',
           'wing_loss', 'cross_entropy_loss', 'LOSS_REGISTRY']


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def smooth_l1_loss(pred, target, beta=1.0):
    """Huber/SmoothL1 with torch's ``beta`` semantics."""
    d = jnp.abs(pred - target)
    out = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(out)


def mse_loss(pred, target):
    d = pred - target
    return jnp.mean(d * d)


def add_loss(pred, target):
    """Mean over batch of per-instance summed keypoint L2 distances
    (reference regression_losses.py:22-26)."""
    return jnp.mean(jnp.sum(jnp.linalg.norm(pred - target, axis=2), axis=1))


def compute_diag(kp):
    """Diagonal of the 2D extent of a keypoint set [B,9,2] → [B]
    (reference regression_losses.py:51-58)."""
    x0 = jnp.min(kp[:, :, 0], axis=1)
    y0 = jnp.min(kp[:, :, 1], axis=1)
    x1 = jnp.max(kp[:, :, 0], axis=1)
    y1 = jnp.max(kp[:, :, 1], axis=1)
    return jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)


def diag_loss(pred, target):
    """SmoothL1(beta=0.4) between predicted and GT box-diagonal lengths
    (reference regression_losses.py:8-20)."""
    return smooth_l1_loss(compute_diag(pred), compute_diag(target), beta=0.4)


def wing_loss(pred, target, w=0.05, eps=2.0):
    """Wing loss (arXiv:1711.06753; reference regression_losses.py:28-49)."""
    wing_const = w - w * jnp.log(1.0 + w / eps)
    d = jnp.abs(pred - target)
    out = jnp.where(d < w, w * jnp.log(1.0 + d / eps), d - wing_const)
    return jnp.mean(out)


def cross_entropy_loss(logits, labels):
    """Mean softmax cross-entropy over integer labels (torch CE semantics)."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return jnp.mean(lse - picked)


LOSS_REGISTRY = {
    'l1': l1_loss,
    'smoothl1': smooth_l1_loss,
    'mse': mse_loss,
    'add_loss': add_loss,
    'diag_loss': diag_loss,
    'wing': wing_loss,
    'cross_entropy': cross_entropy_loss,
}
