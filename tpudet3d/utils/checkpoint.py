"""Orbax checkpointing with the reference's save/resume semantics.

Parity targets (torchdet3d/utils/utils.py:56-64, 86-208):

* ``save_snap`` writes ``snap_{epoch}`` with params / batch_stats /
  opt_state / alwa / epoch every ``save_freq`` epochs and on the last epoch.
* ``resume_from`` restores everything and returns ``epoch + 1``.
* ``load_pretrained_weights`` is *tolerant*: leaves whose path or shape does
  not match the target tree are skipped with a report (the reference strips
  ``module.`` DataParallel prefixes; the JAX equivalent failure mode is a
  changed head shape, which we skip the same way).
"""

import os
import os.path as osp
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ['save_snap', 'resume_from', 'load_pretrained_weights',
           'latest_snapshot', 'snapshot_path']


def snapshot_path(log_path, epoch):
    return osp.abspath(osp.join(log_path, f'snap_{epoch}'))


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_snap(state, epoch, log_path):
    """Save the full TrainState + epoch marker."""
    path = snapshot_path(log_path, epoch)
    print(f'==> saving checkpoint to {path}')
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {'state': jax.device_get(state), 'epoch': epoch},
                   force=True)


def latest_snapshot(log_path):
    """Newest snap_{epoch} dir by epoch number (reference export.py:60-62)."""
    if not osp.isdir(log_path):
        return None
    snaps = [d for d in os.listdir(log_path) if re.match(r'snap_\d+$', d)]
    if not snaps:
        return None
    snaps.sort(key=lambda d: int(d.split('_')[1]))
    return osp.join(log_path, snaps[-1])


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def merge_matching(target_tree, source_tree, verbose=True,
                   return_count=False):
    """Copy leaves from source into target wherever path AND shape match
    (reference load_pretrained_weights tolerance, utils.py:127-183).
    ``return_count=True`` additionally returns the matched-leaf count so
    strict callers (detect/load.py) can refuse partial restores."""
    src = _flatten_with_paths(source_tree)
    matched, discarded = [], []

    def pick(path, leaf):
        key = jax.tree_util.keystr(path)
        if key in src and np.shape(src[key]) == np.shape(leaf):
            matched.append(key)
            return np.asarray(src[key]).astype(np.asarray(leaf).dtype)
        discarded.append(key)
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, target_tree)
    if verbose:
        if not matched:
            raise RuntimeError('The pretrained weights cannot be loaded — '
                               'no matching layers')
        if discarded:
            print(f'** skipped {len(discarded)} unmatched leaves '
                  f'(first few: {discarded[:5]})')
        print(f'Successfully loaded {len(matched)} matching leaves')
    if return_count:
        return merged, len(matched)
    return merged


def load_pretrained_weights(state, file_path):
    """Tolerant partial restore of a saved snapshot into an existing state."""
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(osp.abspath(file_path))
    saved_state = restored['state'] if 'state' in restored else restored
    new_params = merge_matching(jax.device_get(state.params),
                                saved_state['params'])
    new_bs = merge_matching(jax.device_get(state.batch_stats),
                            saved_state.get('batch_stats', {}), verbose=False)
    return state.replace(params=new_params, batch_stats=new_bs)


def resume_from(state, chkpt_path):
    """Full restore: weights + optimizer + alwa; returns (state, start_epoch)
    with start_epoch = saved epoch + 1 (reference utils.py:199-202).

    Snapshots whose only structural difference from the template is the
    presence/absence of the ``ema_params`` field (old pre-EMA snapshots
    into an EMA-enabled config, or EMA-trained snapshots into an
    EMA-disabled config) still restore FULLY — optimizer momentum, ALWA
    and step included — via a second attempt with the field toggled.
    Anything else hits the tolerant weight+stats fallback."""
    print(f'Loading checkpoint from "{chkpt_path}"')

    def _full(ckptr, template):
        restored = ckptr.restore(
            osp.abspath(chkpt_path),
            {'state': jax.device_get(template), 'epoch': 0})
        new_state = jax.tree_util.tree_map(
            lambda t, s: np.asarray(s), jax.device_get(template),
            restored['state'])
        return new_state, int(restored['epoch']) + 1

    with ocp.StandardCheckpointer() as ckptr:
        try:
            new_state, start_epoch = _full(ckptr, state)
            print(f'Loaded full train state; last epoch = {start_epoch}')
            return new_state, start_epoch
        except Exception as e:
            first_err = e
        # Second chance: the only structural difference may be the
        # ema_params KEY (old pre-EMA snapshots lack it entirely; an
        # EMA-trained snapshot carries it into an EMA-disabled config).
        # A dataclass template always has the field, so the retry uses a
        # plain-dict template with the key removed / shaped in, which is
        # how the snapshot itself is stored on disk.
        if hasattr(state, 'ema_params'):
            host = jax.device_get(state)
            base = {f: getattr(host, f) for f in state.__dataclass_fields__}
            base.pop('ema_params')
            # (template, restored-ema handler) per snapshot layout
            attempts = [(dict(base),
                         lambda rs: (None if state.ema_params is None
                                     else jax.tree_util.tree_map(
                                         np.copy, rs['params'])))]
            if state.ema_params is None:
                # EMA-trained snapshot into an EMA-disabled config:
                # restore against a params-shaped slot, then drop it
                with_ema = dict(base)
                with_ema['ema_params'] = jax.tree_util.tree_map(
                    np.copy, base['params'])
                attempts.append((with_ema, lambda rs: None))
            for template, ema_of in attempts:
                try:
                    restored = ckptr.restore(osp.abspath(chkpt_path),
                                             {'state': template, 'epoch': 0})
                    rs = jax.tree_util.tree_map(
                        lambda t, s: np.asarray(s), template,
                        restored['state'])
                    rs.pop('ema_params', None)
                    new_state = state.replace(ema_params=ema_of(rs), **rs)
                    start_epoch = int(restored['epoch']) + 1
                    print('Loaded full train state (ema_params key '
                          'toggled to match the snapshot); last epoch = '
                          f'{start_epoch}')
                    return new_state, start_epoch
                except Exception:
                    continue
        # Tolerant fallback for other structure mismatches: restore raw
        # and merge path-wise.  It MUST carry the batch_stats — losing
        # them serves init BN statistics (mean 0 / var 1) and silently
        # wrecks every prediction (regression: round-3 protocol runs
        # collapsed to 2D err 0.1 after the EMA field landed).
        # Optimizer/ALWA state is dropped (documented tolerance, like
        # the reference's partial load, utils.py:127-183); merges are
        # VERBOSE so partially-unmatched BN/EMA leaves are reported
        # instead of silently keeping init values.
        print(f'Full state restore failed ({type(first_err).__name__}); '
              'falling back to weight+stats restore')
        restored = ckptr.restore(osp.abspath(chkpt_path))
        saved = restored['state'] if 'state' in restored else restored
        new_params = merge_matching(jax.device_get(state.params),
                                    saved['params'])
        replace = {'params': new_params}
        if saved.get('batch_stats') and getattr(state, 'batch_stats', None):
            replace['batch_stats'] = merge_matching(
                jax.device_get(state.batch_stats), saved['batch_stats'])
        if getattr(state, 'ema_params', None) is not None:
            if saved.get('ema_params'):
                replace['ema_params'] = merge_matching(
                    jax.device_get(state.ema_params), saved['ema_params'])
            else:
                # template keeps an EMA but the snapshot predates it:
                # seed the average from the restored weights
                replace['ema_params'] = jax.tree_util.tree_map(
                    np.copy, new_params)
        epoch = int(restored.get('epoch', -1))
        return state.replace(**replace), epoch + 1
