"""Optimizers and per-epoch LR schedules via optax.

Registry parity with the reference builders
(torchdet3d/builders/optim_builder.py, scheduler_builder.py), including the
quirk that ``'adam'`` builds AdamW (optim_builder.py:10-12, SURVEY.md §8.6).

The reference steps its scheduler once per *epoch* after checkpointing
(trainer/train.py:110-114).  We keep those semantics: ``build_scheduler``
returns ``lr(epoch) -> float`` and the trainer writes it into the
``optax.inject_hyperparams`` state at each epoch boundary — resume-safe and
independent of steps-per-epoch.
"""

import math

import optax

AVAILABLE_OPTIMS = ['sgd', 'rmsprop', 'adam', 'adadelta']
AVAILABLE_SCHEDS = ['cosine', 'exp', 'stepLR', 'multistepLR']

__all__ = ['build_optimizer', 'build_scheduler', 'set_learning_rate',
           'current_learning_rate', 'AVAILABLE_OPTIMS', 'AVAILABLE_SCHEDS']


def build_optimizer(cfg):
    """Returns an optax GradientTransformation with an injected, mutable
    learning_rate hyperparameter."""
    name = cfg.optim.name
    assert name in AVAILABLE_OPTIMS, f'unknown optimizer {name}'
    lr = float(cfg.optim.lr)
    wd = float(cfg.optim.wd or 0.0)
    if name == 'adam':        # AdamW, like the reference
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=float(cfg.optim.betas[0]),
            b2=float(cfg.optim.betas[1]), weight_decay=wd)
    elif name == 'sgd':
        def sgd_wd(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(learning_rate, momentum=float(cfg.optim.momentum),
                          nesterov=bool(cfg.optim.nesterov)))
        opt = optax.inject_hyperparams(sgd_wd)(learning_rate=lr)
    elif name == 'rmsprop':
        def rmsprop_wd(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.rmsprop(learning_rate, decay=float(cfg.optim.alpha)))
        opt = optax.inject_hyperparams(rmsprop_wd)(learning_rate=lr)
    else:                      # adadelta
        def adadelta_wd(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.adadelta(learning_rate, rho=float(cfg.optim.rho)))
        opt = optax.inject_hyperparams(adadelta_wd)(learning_rate=lr)
    return opt


def build_scheduler(cfg):
    """epoch -> learning-rate function (reference scheduler semantics)."""
    name = cfg.scheduler.name
    if not name:
        return None
    assert name in AVAILABLE_SCHEDS, f'unknown scheduler {name}'
    lr0 = float(cfg.optim.lr)
    if name == 'cosine':
        t_max = int(cfg.data.max_epochs)
        eta_min = 5e-6

        def lr_fn(epoch):
            return eta_min + (lr0 - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2
    elif name == 'exp':
        gamma = float(cfg.scheduler.exp_gamma)

        def lr_fn(epoch):
            return lr0 * gamma ** epoch
    elif name == 'stepLR':
        step = int(cfg.scheduler.steps[0])
        gamma = float(cfg.scheduler.gamma)

        def lr_fn(epoch):
            return lr0 * gamma ** (epoch // step)
    else:  # multistepLR
        milestones = [int(s) for s in cfg.scheduler.steps]
        gamma = float(cfg.scheduler.gamma)

        def lr_fn(epoch):
            return lr0 * gamma ** sum(epoch >= m for m in milestones)
    return lr_fn


def set_learning_rate(opt_state, lr):
    """Write the lr into an inject_hyperparams state (host-side, per epoch)."""
    import jax.numpy as jnp
    opt_state.hyperparams['learning_rate'] = jnp.asarray(
        lr, dtype=opt_state.hyperparams['learning_rate'].dtype)
    return opt_state


def current_learning_rate(opt_state):
    return float(opt_state.hyperparams['learning_rate'])
