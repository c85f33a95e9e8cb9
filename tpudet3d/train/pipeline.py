"""One-call training-pipeline assembly shared by the CLI, tests, benchmarks
and the multi-chip dry run.

Builds: model → loss manager → optimizer/schedule → initialized TrainState
(replicated over the mesh) → jitted train/eval steps → device augmentation
fns → loaders.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax

from ..data import build_loader, build_augmentations
from ..losses import build_loss, LossManager
from ..models import build_model
from ..parallel import make_mesh, shard_batch, replicate
from .optim import build_optimizer, build_scheduler
from .state import create_train_state
from .steps import make_train_step, make_eval_step

__all__ = ['TrainingPipeline', 'setup_training']


@dataclass
class TrainingPipeline:
    model: Any
    loss_manager: Any
    optimizer: Any
    lr_schedule: Optional[Callable]
    state: Any
    train_step: Callable
    eval_step: Callable
    train_aug: Callable
    test_aug: Callable
    mesh: Any
    put_fn: Callable
    train_loader: Any = None
    val_loader: Any = None
    test_loader: Any = None


def _maybe_import_torch_weights(cfg, state):
    """Consume ``cfg.model.pretrained`` / a ``.pth`` ``load_weights``
    (reference: model_builder.py:37-69 + mobilenetv3.py:234-271 download and
    load ImageNet(-21k) torch weights when ``pretrained=True``)."""
    from ..utils.torch_import import (load_torch_checkpoint_into,
                                      resolve_pretrained_path)
    lw = str(cfg.model.get('load_weights') or '')
    if cfg.model.get('resume'):
        return state            # resume wins; handled by the CLI
    if lw.endswith(('.pth', '.pt')):
        path = lw
    else:
        if lw:                  # own orbax snapshot; handled by the CLI
            return state
        pretrained = cfg.model.get('pretrained', False)
        if not pretrained:
            return state
        path = resolve_pretrained_path(cfg.model.name, pretrained)
        if path is None:
            print(f'WARNING: model.pretrained={pretrained!r} but no local '
                  f'torch checkpoint found (set $TPUDET3D_PRETRAINED_DIR or '
                  f'place pretrained/{cfg.model.name}.pth); '
                  f'training from random init')
            return state
    new_params, new_bs = load_torch_checkpoint_into(
        state.params, state.batch_stats, path)
    return state.replace(params=new_params, batch_stats=new_bs)


def setup_training(cfg, mesh=None, seed=None, with_loaders=True):
    if seed is None:
        seed = int(cfg.utils.random_seeds or 5)
    if mesh is None:
        devices = jax.devices()
        if cfg.data_parallel.use_parallel and cfg.data_parallel.num_devices:
            devices = devices[:int(cfg.data_parallel.num_devices)]
        elif not cfg.data_parallel.use_parallel:
            devices = devices[:1]
        mesh = make_mesh(devices)

    model = build_model(cfg)
    criterions = build_loss(cfg)
    loss_manager = LossManager(criterions, cfg.loss.coeffs, cfg.loss.alwa)
    optimizer = build_optimizer(cfg)
    lr_schedule = build_scheduler(cfg)

    init_key = jax.random.PRNGKey(seed)
    input_shape = (max(int(cfg.data.train_batch_size), 1), *cfg.data.resize, 3)
    # optim.ema_decay > 0 keeps an in-step exponential moving average of
    # the params; validation/serving prefer it when present (net-new vs
    # the reference, which has no weight averaging)
    ema_decay = float(cfg.optim.get('ema_decay', 0.0) or 0.0)
    state = create_train_state(model, optimizer, loss_manager, init_key,
                               input_shape,
                               num_classes=int(cfg.model.num_classes or 9),
                               ema_decay=ema_decay)
    state = _maybe_import_torch_weights(cfg, state)
    state = replicate(state, mesh)

    train_aug, test_aug = build_augmentations(cfg)
    pipe = TrainingPipeline(
        model=model, loss_manager=loss_manager, optimizer=optimizer,
        lr_schedule=lr_schedule, state=state,
        # device augmentation is fused INTO the train step (single program;
        # no intermediate f32 image materialization)
        train_step=make_train_step(model, loss_manager, optimizer,
                                   augment_fn=train_aug,
                                   ema_decay=ema_decay),
        eval_step=make_eval_step(model, num_classes=9),
        train_aug=jax.jit(train_aug), test_aug=jax.jit(test_aug),
        mesh=mesh, put_fn=partial(shard_batch, mesh=mesh))
    if with_loaders:
        pipe.train_loader, pipe.val_loader, pipe.test_loader = build_loader(
            cfg, seed=seed)
    return pipe
