"""Hyperparameter sweep over WingLoss (w, eps) — reference
scripts/optuna_optim.py surface, built on tpudet3d.utils.hpo (uses real
optuna when importable, otherwise the built-in random-search +
median-pruning study).

Objective = validation SADD after each epoch, minimized; fractional
train/val iteration caps like the reference (:46-49).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import jax
import numpy as np

from tpudet3d.core import read_py_config, Logger, set_random_seed, AverageMeter

from tpudet3d.core import enable_compile_cache
enable_compile_cache()
from tpudet3d.train.pipeline import setup_training
from tpudet3d.train.optim import set_learning_rate
from tpudet3d.utils.hpo import create_study, TrialPruned


def objective(cfg, args, trial):
    eps = trial.suggest_float('eps', 0.01, 3)
    w = trial.suggest_float('w', 0.01, 10)
    cfg.loss.w = w
    cfg.loss.eps = eps
    print(f'\nnext trial with [w: {w:.4f}, epsilon: {eps:.4f}]')

    pipe = setup_training(cfg)
    state = pipe.state
    rng = jax.random.PRNGKey(0)

    n_train = max(1, int(args.n_training_iterations * len(pipe.train_loader)))
    n_val = max(1, int(args.n_validate_iterations * len(pipe.val_loader)))

    obj = float('inf')
    for epoch in range(args.epochs):
        if pipe.lr_schedule is not None:
            set_learning_rate(state.opt_state, pipe.lr_schedule(epoch))
        losses = AverageMeter()
        for it, (imgs, kps, cats, _n) in enumerate(pipe.train_loader):
            if it >= n_train:
                break
            rng, k = jax.random.split(rng)
            # augmentation is fused inside train_step
            state, metrics = pipe.train_step(state, pipe.put_fn(imgs),
                                             pipe.put_fn(kps),
                                             pipe.put_fn(cats), k)
            losses.update(float(np.asarray(metrics)[0]), imgs.shape[0])
        # validation SADD
        sadd_meter = AverageMeter()
        for it, (imgs, kps, cats, _n) in enumerate(pipe.val_loader):
            if it >= n_val:
                break
            rng, k = jax.random.split(rng)
            imgs_d, kps_d = pipe.test_aug(pipe.put_fn(imgs),
                                          pipe.put_fn(kps), k)
            (add_s, sadd_s, _iou, _acc, _c), _ = pipe.eval_step(
                state.params, state.batch_stats, imgs_d, kps_d,
                pipe.put_fn(cats), compute_iou=False)
            sadd_meter.update(float(np.asarray(sadd_s).sum()) / imgs.shape[0],
                              imgs.shape[0])
        obj = sadd_meter.avg
        print(f'trial {trial.number} epoch {epoch}: loss {losses.avg:.4f} '
              f'val SADD {obj:.4f}')
        trial.report(obj, epoch)
        if trial.should_prune():
            raise TrialPruned()
    return obj


def main():
    parser = argparse.ArgumentParser(description='hyperparameter sweep')
    parser.add_argument('--root', type=str, default='')
    parser.add_argument('--disable_store_log', action='store_false')
    parser.add_argument('--config', type=str,
                        default='./configs/default_config.py')
    parser.add_argument('-e', '--epochs', type=int, default=150)
    parser.add_argument('--n_trials', type=int, default=100)
    parser.add_argument('--n_training_iterations', type=float, default=.5)
    parser.add_argument('--n_validate_iterations', type=float, default=.5)
    args = parser.parse_args()
    cfg = read_py_config(args.config)
    if args.root:
        cfg.data.root = args.root
    if args.disable_store_log:
        sys.stdout = Logger(osp.join(
            cfg.output_dir, 'optuna.log' + time.strftime('-%Y-%m-%d-%H-%M-%S')))
    set_random_seed(int(cfg.utils.random_seeds))

    study = create_study(study_name='regression task', direction='minimize')
    from functools import partial
    try:
        study.optimize(partial(objective, cfg, args), n_trials=args.n_trials)
    finally:
        def trials_by_state(name):
            try:
                from optuna.trial import TrialState
                return study.get_trials(deepcopy=False,
                                        states=[getattr(TrialState, name)])
            except ImportError:
                return study.get_trials(states=[name])

        pruned = trials_by_state('PRUNED')
        complete = trials_by_state('COMPLETE')
        print('Study statistics: ')
        print('  Number of finished trials: ', len(study.trials))
        print('  Number of pruned trials: ', len(pruned))
        print('  Number of complete trials: ', len(complete))
        if complete:
            trial = study.best_trial
            print('Best trial:')
            print('  Value: ', trial.value)
            print('  Params: ')
            for key, value in trial.params.items():
                print(f'    {key}: {value}')


if __name__ == '__main__':
    main()
