"""Train state: params + BN stats + optimizer + ALWA, as one donated pytree.

The reference scatters this state across objects (model.state_dict(),
optimizer/scheduler state dicts, LossManager python lists — utils.py:56-64).
Here it is a single ``flax.struct`` pytree so the whole training step is a
pure ``state, batch -> state, metrics`` function with donated buffers.
"""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..losses.manager import AlwaState

__all__ = ['TrainState', 'create_train_state']


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    alwa: AlwaState
    step: jnp.ndarray
    # Exponential moving average of params (optim.ema_decay > 0); None
    # when disabled so old checkpoints restore unchanged.  Net-new vs the
    # reference (no EMA there): the averaged weights are what validation
    # and serving load when present.
    ema_params: Any = None


def create_train_state(model, optimizer, loss_manager, rng, input_shape,
                       num_classes=9, ema_decay=0.0):
    """Initialize parameters and optimizer state for the wrapped model."""
    dummy = jnp.zeros(input_shape, jnp.float32)
    dummy_cats = jnp.zeros((input_shape[0],), jnp.int32)
    # jitted init: one cached program instead of hundreds of RTT-bound
    # eager dispatches (see detect/train.py create_detector_state)
    variables = jax.jit(partial(model.init, train=False))(
        {'params': rng, 'dropout': rng}, dummy, dummy_cats)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = optimizer.init(params)
    # ema starts as a COPY: aliasing the params buffers would make the
    # donated train-step state contain the same buffer twice (XLA
    # rejects double donation)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, alwa=loss_manager.init_state(),
                      step=jnp.zeros((), jnp.int32),
                      ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                                  if ema_decay > 0 else None))


def param_count(params):
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def eval_params(state):
    """Weights to evaluate/serve: the EMA average when maintained
    (optim.ema_decay > 0), otherwise the raw params."""
    ema = getattr(state, 'ema_params', None)
    return state.params if ema is None else ema
