"""Checkpoint utilities: tolerant merge, snapshot discovery, torch import."""

import numpy as np
import pytest

from tpudet3d.utils.checkpoint import merge_matching, latest_snapshot


class TestMergeMatching:

    def test_matching_paths_copied(self):
        target = {'a': np.zeros((2, 2)), 'b': {'c': np.zeros(3)}}
        source = {'a': np.ones((2, 2)), 'b': {'c': np.full(3, 2.0)}}
        out = merge_matching(target, source, verbose=False)
        assert np.all(out['a'] == 1) and np.all(out['b']['c'] == 2)

    def test_shape_mismatch_skipped(self):
        target = {'a': np.zeros((2, 2)), 'b': np.zeros(3)}
        source = {'a': np.ones((4, 4)), 'b': np.full(3, 2.0)}
        out = merge_matching(target, source, verbose=False)
        assert np.all(out['a'] == 0)      # skipped: wrong shape
        assert np.all(out['b'] == 2)

    def test_no_match_raises(self):
        with pytest.raises(RuntimeError):
            merge_matching({'a': np.zeros(2)}, {'x': np.ones(3)})


class TestSnapshots:

    def test_latest_snapshot(self, tmp_path):
        for e in (0, 2, 10):
            (tmp_path / f'snap_{e}').mkdir()
        (tmp_path / 'other').mkdir()
        assert latest_snapshot(str(tmp_path)).endswith('snap_10')
        assert latest_snapshot(str(tmp_path / 'missing')) is None


class TestTorchImport:

    def test_structural_import_from_torch_baseline(self):
        """Import our torch CPU baseline's state_dict into the flax model:
        the ordered shape-matching must place the conv/bn tensors."""
        torch = pytest.importorskip('torch')
        import jax
        import jax.numpy as jnp
        from benchmarks.torch_baseline import TorchRegressorBaseline
        from tpudet3d.core import AttrDict
        from tpudet3d.models import build_model
        from tpudet3d.utils.torch_import import load_torch_checkpoint_into

        tmodel = TorchRegressorBaseline()
        import tempfile, os.path as osp
        with tempfile.TemporaryDirectory() as d:
            path = osp.join(d, 'w.pth')
            torch.save(tmodel.state_dict(), path)
            model = build_model(AttrDict(model=dict(
                name='mobilenetv3_large_21k', pretrained=False,
                num_classes=9, bf16=False)))
            key = jax.random.PRNGKey(0)
            variables = model.init({'params': key, 'dropout': key},
                                   jnp.zeros((1, 64, 64, 3)),
                                   jnp.zeros((1,), jnp.int32))
            params, bstats = load_torch_checkpoint_into(
                variables['params'], variables['batch_stats'], path,
                verbose=False)
            # the stem conv must now equal the torch stem (same shape order)
            t_stem = tmodel.features[0][0].weight.detach().numpy() \
                .transpose(2, 3, 1, 0)
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            stem_leaf = [l for p, l in flat
                         if np.shape(l) == t_stem.shape]
            assert any(np.allclose(np.asarray(l), t_stem)
                       for l in stem_leaf)
