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
    state = create_train_state(model, optimizer, loss_manager, init_key,
                               input_shape,
                               num_classes=int(cfg.model.num_classes or 9))
    state = replicate(state, mesh)

    train_aug, test_aug = build_augmentations(cfg)
    pipe = TrainingPipeline(
        model=model, loss_manager=loss_manager, optimizer=optimizer,
        lr_schedule=lr_schedule, state=state,
        # device augmentation is fused INTO the train step (single program;
        # no intermediate f32 image materialization)
        train_step=make_train_step(model, loss_manager, optimizer,
                                   augment_fn=train_aug),
        eval_step=make_eval_step(model, num_classes=9),
        train_aug=jax.jit(train_aug), test_aug=jax.jit(test_aug),
        mesh=mesh, put_fn=partial(shard_batch, mesh=mesh))
    if with_loaders:
        pipe.train_loader, pipe.val_loader, pipe.test_loader = build_loader(
            cfg, seed=seed)
    return pipe
