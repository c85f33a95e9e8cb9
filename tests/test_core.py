"""Core utilities: AttrDict/config reader, meters, tables, loader, hpo."""

import numpy as np
import pytest

from tpudet3d.core import (AttrDict, read_py_config, AverageMeter, TextTable,
                           OBJECTRON_CLASSES, DETECTOR_CLASSES,
                           DETECTOR_TO_REGRESSOR_CLS)
from tpudet3d.data.loader import BatchLoader
from tpudet3d.data.dataset import SyntheticObjectron
from tpudet3d.utils.hpo import create_study, TrialPruned


class TestAttrDict:

    def test_attribute_access_and_missing_falsy(self):
        cfg = AttrDict(model=dict(name='x', sub=dict(k=1)))
        assert cfg.model.name == 'x'
        assert cfg.model.sub.k == 1
        assert not cfg.model.resume          # missing → falsy
        assert not cfg.nonexistent.deeply.nested
        assert 'resume' not in cfg.model     # missing reads don't pollute

    def test_config_reader(self, tmp_path):
        p = tmp_path / 'cfg.py'
        p.write_text("a = dict(b=2)\nc = [1, 2]\n_hidden = 3\n")
        cfg = read_py_config(str(p))
        assert cfg.a.b == 2 and cfg.c == [1, 2]
        assert '_hidden' in cfg  # only dunders are filtered

    def test_class_order_translation(self):
        # camera/cereal_box swap between the two stages (SURVEY.md §8.1)
        for det_id, det_name in enumerate(DETECTOR_CLASSES):
            reg_id = DETECTOR_TO_REGRESSOR_CLS[det_id]
            assert OBJECTRON_CLASSES[reg_id] == det_name


class TestMeters:

    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0, 2)
        m.update(4.0, 2)
        assert m.avg == 2.5 and m.count == 4 and m.val == 4.0

    def test_text_table(self):
        t = TextTable(['a', 'b'])
        t.add_row(['x', 0.12345])
        s = str(t)
        assert 'x' in s and '0.1235' in s and s.count('+') >= 6


class TestLoader:

    def test_shapes_and_partial_batch(self):
        ds = SyntheticObjectron(length=10, resize=(32, 32))
        loader = BatchLoader(ds, batch_size=4, shuffle=False)
        batches = list(loader)
        assert len(batches) == 3
        for imgs, kps, cats, true_n in batches[:-1]:
            assert imgs.shape == (4, 32, 32, 3) and kps.shape == (4, 9, 2)
            assert true_n == 4
        # padded tail keeps the static shape but reports the true count
        imgs, kps, cats, true_n = batches[-1]
        assert imgs.shape == (4, 32, 32, 3) and true_n == 2

    def test_drop_last(self):
        ds = SyntheticObjectron(length=10, resize=(32, 32))
        loader = BatchLoader(ds, batch_size=4, drop_last=True)
        assert len(list(loader)) == 2

    def test_set_epoch_forwarded_to_dataset(self):
        """Datasets exposing set_epoch get the 0-based epoch before each
        pass (drives epoch-varying crop jitter, dataset.jitter_margins)."""
        class EpochDs(SyntheticObjectron):
            seen = []

            def set_epoch(self, epoch):
                self.seen.append(epoch)

        ds = EpochDs(length=4, resize=(16, 16))
        loader = BatchLoader(ds, batch_size=4)
        list(loader)
        list(loader)
        assert ds.seen == [0, 1]

    def test_worker_exception_propagates(self):
        """Regression: a dataset/transform exception in a worker thread must
        raise in the consuming loop, not strand it on q.get() forever (the
        round-3 _DetBatchLoader arity break hung training instead of
        failing it)."""
        class BoomDs(SyntheticObjectron):
            def __getitem__(self, idx):
                if idx == 5:
                    raise RuntimeError('boom')
                return super().__getitem__(idx)

        loader = BatchLoader(BoomDs(length=8, resize=(16, 16)), batch_size=4)
        with pytest.raises(RuntimeError, match='boom'):
            list(loader)

    def test_shuffle_reproducible_across_instances(self):
        ds = SyntheticObjectron(length=16, resize=(32, 32))
        a = [c.tolist() for _, _, c, _ in BatchLoader(ds, 4, shuffle=True,
                                                      seed=3)]
        b = [c.tolist() for _, _, c, _ in BatchLoader(ds, 4, shuffle=True,
                                                      seed=3)]
        assert a == b


class TestHPO:

    def test_random_study_minimize(self):
        study = create_study(direction='minimize', prefer_optuna=False, seed=0)

        def objective(trial):
            x = trial.suggest_float('x', -5, 5)
            trial.report(x * x, 0)
            if trial.should_prune():
                raise TrialPruned()
            return x * x

        study.optimize(objective, n_trials=20)
        assert study.best_trial.value == min(
            t.value for t in study.get_trials(states=['COMPLETE']))
        assert 'x' in study.best_trial.params
