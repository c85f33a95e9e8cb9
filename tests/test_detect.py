"""Detector-stage unit tests: anchors, coder, assigner, NMS, loss."""

import numpy as np
import jax
import jax.numpy as jnp

from tpudet3d.detect import (generate_anchors, num_anchors_per_level,
                             encode_boxes, decode_boxes, assign_anchors,
                             iou_xyxy, greedy_nms, soft_nms,
                             decode_detections, ssd_loss, SSDDetector)


class TestAnchors:

    def test_count_and_validity(self):
        anchors = generate_anchors()
        k1, k2 = num_anchors_per_level()
        assert anchors.shape == (19 * 19 * k1 + 10 * 10 * k2, 4)
        assert np.all(anchors[:, 2] > anchors[:, 0])
        assert np.all(anchors[:, 3] > anchors[:, 1])


class TestCoder:

    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        anchors = jnp.asarray(generate_anchors()[:256])
        shift = rng.uniform(-10, 10, (256, 4)).astype(np.float32)
        gt = anchors + jnp.asarray(shift)
        deltas = encode_boxes(anchors, gt)
        back = decode_boxes(anchors, deltas)
        assert np.allclose(np.asarray(back), np.asarray(gt), atol=1e-2)


class TestAssigner:

    def test_basic_assignment(self):
        anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                               [100, 100, 110, 110]], jnp.float32)
        gt = jnp.asarray([[1, 1, 11, 11], [19, 19, 31, 31],
                          [0, 0, 0, 0]], jnp.float32)
        valid = jnp.asarray([True, True, False])
        assigned, pos = assign_anchors(anchors, gt, valid)
        assigned = np.asarray(assigned)
        assert assigned[0] == 0 and assigned[1] == 1 and assigned[2] == -1

    def test_gt_claims_best_anchor_below_thr(self):
        # IoU < 0.4 but GT still claims its best anchor
        anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        gt = jnp.asarray([[6, 6, 16, 16]], jnp.float32)
        valid = jnp.asarray([True])
        assigned, pos = assign_anchors(anchors, gt, valid)
        assert np.asarray(assigned)[0] == 0

    def test_padded_gt_never_matches(self):
        anchors = jnp.asarray(generate_anchors()[:64])
        gt = jnp.zeros((4, 4), jnp.float32)
        valid = jnp.zeros((4,), bool)
        assigned, pos = assign_anchors(anchors, gt, valid)
        assert not np.any(np.asarray(pos))


class TestNMS:

    def test_greedy_nms_suppresses(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10.5, 10.5],
                             [50, 50, 60, 60]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep = np.asarray(greedy_nms(boxes, scores, iou_thr=0.45))
        assert keep.tolist() == [True, False, True]

    def test_soft_nms_decays_instead_of_killing(self):
        # same geometry as the greedy test: the overlapped box SURVIVES
        # with a decayed (but nonzero) score; the far box is untouched
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10.5, 10.5],
                             [50, 50, 60, 60]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        out = np.asarray(soft_nms(boxes, scores, sigma=0.5))
        iou = float(iou_xyxy(boxes[:1], boxes[1:2])[0, 0])
        assert out[0] == 0.9                      # top box undecayed
        assert np.isclose(out[1], 0.8 * np.exp(-iou ** 2 / 0.5), atol=1e-5)
        assert out[1] > 0.1                       # survives, unlike hard NMS
        assert np.isclose(out[2], 0.7, atol=1e-6)  # no overlap → no decay

    def test_soft_nms_dup_cutoff_zeroes_duplicates_keeps_occluded(self):
        # box 1 is a near-duplicate of box 0 (IoU ~0.82 > dup_iou), box 2
        # a distinct occluded object (IoU ~0.5): the cutoff zeroes the
        # duplicate outright while the occluded box only decays
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 9],
                             [0, 3.4, 10, 13.4]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        out = np.asarray(soft_nms(boxes, scores, sigma=0.5, dup_iou=0.75))
        assert out[0] == 0.9
        assert out[1] == 0.0                      # duplicate zeroed
        assert out[2] > 0.2                       # occluded survives
        # dup_iou=1.0 reproduces pure gaussian decay (duplicate survives)
        pure = np.asarray(soft_nms(boxes, scores, sigma=0.5, dup_iou=1.0))
        assert pure[1] > 0.1

    def test_soft_nms_zero_scores_stay_zero(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.asarray([0.9, 0.0])
        out = np.asarray(soft_nms(boxes, scores, sigma=0.5))
        assert out[0] == 0.9 and out[1] == 0.0

    def test_decode_detections_soft_nms_keeps_occluded(self):
        # two heavily-overlapping same-class candidates: hard NMS erases
        # the second, soft-NMS keeps both above a low floor
        anchors = jnp.asarray(generate_anchors())
        A = anchors.shape[0]
        logits = jnp.full((A, 10), -8.0)
        # give two nearby anchors confident class-0 logits
        logits = logits.at[0, 0].set(6.0).at[1, 0].set(5.0)
        deltas = jnp.zeros((A, 4))
        hard = np.asarray(decode_detections(
            logits, deltas, anchors, score_thr=0.01, max_per_img=8,
            pre_nms_k=16))
        soft = np.asarray(decode_detections(
            logits, deltas, anchors, score_thr=0.01, max_per_img=8,
            pre_nms_k=16, soft_nms_sigma=0.5))
        iou01 = float(iou_xyxy(anchors[:1], anchors[1:2])[0, 0])
        if iou01 > 0.45:   # clustered anchors 0,1 overlap at stride 16
            assert (hard[:, 4] > 0.01).sum() < (soft[:, 4] > 0.01).sum()
        assert np.all(np.diff(soft[:, 4]) <= 1e-6)   # still score-desc

    def test_decode_detections_shapes(self):
        anchors = jnp.asarray(generate_anchors())
        A = anchors.shape[0]
        rng = jax.random.PRNGKey(0)
        logits = jax.random.normal(rng, (A, 10))
        deltas = jnp.zeros((A, 4))
        out = np.asarray(decode_detections(logits, deltas, anchors,
                                           max_per_img=50, pre_nms_k=64))
        assert out.shape == (50, 6)
        # scores sorted desc
        assert np.all(np.diff(out[:, 4]) <= 1e-6)


class TestSSDLoss:

    def test_loss_finite_and_grads(self):
        anchors = jnp.asarray(generate_anchors()[:128])
        B, A = 2, 128
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(key, (B, A, 10))
        deltas = jax.random.normal(jax.random.PRNGKey(1), (B, A, 4)) * 0.1
        gt_boxes = jnp.asarray(np.tile(np.asarray(anchors)[:3][None], (B, 1, 1)))
        gt_labels = jnp.asarray([[0, 3, 7]] * B, jnp.int32)
        gt_valid = jnp.ones((B, 3), bool)

        def loss_fn(lg, dl):
            total, _ = ssd_loss(lg, dl, anchors, gt_boxes, gt_labels, gt_valid)
            return total

        val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(logits, deltas)
        assert np.isfinite(float(val))
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))

    def test_loss_zero_when_perfect(self):
        from tpudet3d.detect.coder import encode_boxes
        anchors = jnp.asarray(generate_anchors()[:64])
        gt_boxes = anchors[None, :2]
        gt_labels = jnp.asarray([[1, 2]], jnp.int32)
        gt_valid = jnp.ones((1, 2), bool)
        # derive the true assignment, then construct perfect predictions
        assigned, pos = assign_anchors(anchors, gt_boxes[0], gt_valid[0])
        assigned = np.asarray(assigned)
        pos = np.asarray(pos)
        logits = np.zeros((1, 64, 10), np.float32)
        logits[0, :, 9] = 20.0                          # background default
        deltas = np.zeros((1, 64, 4), np.float32)
        labels_np = np.asarray([1, 2])
        target = encode_boxes(anchors, gt_boxes[0][np.maximum(assigned, 0)])
        for a in np.nonzero(pos)[0]:
            logits[0, a, 9] = 0.0
            logits[0, a, labels_np[assigned[a]]] = 20.0
            deltas[0, a] = np.asarray(target)[a]
        total, parts = ssd_loss(jnp.asarray(logits), jnp.asarray(deltas),
                                anchors, gt_boxes, gt_labels, gt_valid)
        assert float(parts['cls_loss']) < 1e-3
        assert float(parts['reg_loss']) < 1e-5


class TestSSDModel:

    def test_forward_shapes(self):
        model = SSDDetector(num_classes=9)
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 300, 300, 3), jnp.float32)
        variables = model.init(key, x)
        logits, deltas = model.apply(variables, x)
        A = generate_anchors().shape[0]
        assert logits.shape == (1, A, 10)
        assert deltas.shape == (1, A, 4)


class TestCascade:

    def _tiny(self):
        model = SSDDetector(num_classes=9, width_mult=0.5, cascade=True)
        key = jax.random.PRNGKey(3)
        x = jax.random.uniform(key, (1, 300, 300, 3), jnp.float32)
        variables = model.init(key, x)
        return model, variables, x

    def test_train_mode_returns_stage_deltas(self):
        model, variables, x = self._tiny()
        (logits, deltas), _ = model.apply(variables, x, train=True,
                                          mutable=['batch_stats'])
        A = generate_anchors().shape[0]
        assert isinstance(deltas, tuple) and len(deltas) == 2
        assert deltas[0].shape == (1, A, 4) and deltas[1].shape == (1, A, 4)
        assert logits.shape == (1, A, 10)

    def test_eval_composes_and_reencodes_exactly(self):
        from tpudet3d.detect import CASCADE_STDS
        model, variables, x = self._tiny()
        logits, composed = model.apply(variables, x, train=False)
        anchors = jnp.asarray(generate_anchors())
        # recover the per-stage EVAL-mode deltas through non-cascade
        # twins sharing the same backbone params/batch_stats: twin1's
        # reg_heads are the cascade's stage-1 heads, twin2's are the
        # stage-2 heads — identical features, so the twins' outputs ARE
        # d1/d2 as the cascade eval forward computed them
        twin = SSDDetector(num_classes=9, width_mult=0.5, cascade=False)
        p = dict(variables['params'])
        p1 = {k: v for k, v in p.items() if not k.startswith('reg2_heads')}
        p2 = dict(p1)
        for i in range(2):
            p2[f'reg_heads_{i}'] = p[f'reg2_heads_{i}']
        bs = variables['batch_stats']
        bs1 = {k: v for k, v in bs.items()
               if not k.startswith('reg2_heads')} if bs else bs
        _, d1 = twin.apply({'params': p1, 'batch_stats': bs1}, x,
                           train=False)
        bs2 = dict(bs1)
        for i in range(2):
            if f'reg2_heads_{i}' in (bs or {}):
                bs2[f'reg_heads_{i}'] = bs[f'reg2_heads_{i}']
        _, d2 = twin.apply({'params': p2, 'batch_stats': bs2}, x,
                           train=False)
        refined = decode_boxes(anchors, d1[0])
        final = decode_boxes(refined, d2[0], stds=CASCADE_STDS)
        # downstream consumers decode the composed deltas with the plain
        # coder — the result must be the cascade's final boxes exactly
        back = decode_boxes(anchors, composed[0])
        assert composed.shape == (1, anchors.shape[0], 4)
        assert np.allclose(np.asarray(back), np.asarray(final), atol=1e-2)

    def test_cascade_loss_trains_second_head(self):
        model, variables, x = self._tiny()
        anchors = jnp.asarray(generate_anchors())
        gt_boxes = jnp.asarray([[[40.0, 40, 120, 120], [150, 150, 260, 230]]])
        gt_labels = jnp.asarray([[2, 5]], jnp.int32)
        gt_valid = jnp.asarray([[True, True]])

        def loss_fn(params):
            (logits, (d1, d2)), _ = model.apply(
                {'params': params,
                 'batch_stats': variables['batch_stats']},
                x, train=True, mutable=['batch_stats'])
            total, parts = ssd_loss(logits, d1, anchors, gt_boxes, gt_labels,
                                    gt_valid, cascade_deltas=d2,
                                    giou_weight=2.0)
            return total, parts

        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables['params'])
        assert np.isfinite(float(total))
        # the stage-2 head receives gradient through its own loss term
        g2 = jax.tree_util.tree_reduce(
            lambda a, leaf: a + float(jnp.sum(jnp.abs(leaf))), 
            grads['reg2_heads_0'], 0.0)
        assert g2 > 0.0
        # stage-1 head must NOT receive gradient from the stage-2 term
        # beyond its own (stop_gradient) — check it is still finite
        g1 = jax.tree_util.tree_reduce(
            lambda a, leaf: a + float(jnp.sum(jnp.abs(leaf))),
            grads['reg_heads_0'], 0.0)
        assert np.isfinite(g1)


class TestGIoU:

    def test_identical_boxes(self):
        from tpudet3d.detect import giou_xyxy_paired
        b = jnp.asarray([[10.0, 10, 50, 60], [0, 0, 5, 5]])
        g = giou_xyxy_paired(b, b)
        assert np.allclose(np.asarray(g), 1.0, atol=1e-6)

    def test_disjoint_negative(self):
        from tpudet3d.detect import giou_xyxy_paired
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[100.0, 100, 110, 110]])
        assert float(giou_xyxy_paired(a, b)[0]) < 0.0


class TestBoxVoting:

    def test_voting_tightens_noisy_candidates(self):
        # one object, several noisy candidate decodes: voting should land
        # closer to the candidates' score-weighted mean than the argmax box
        rng = np.random.RandomState(7)
        gt = np.array([100.0, 80, 200, 190], np.float32)
        A = generate_anchors().shape[0]
        anchors = jnp.asarray(generate_anchors())
        # craft logits/deltas: 8 anchors near the gt get high class-3
        # scores and noisy regressions; everything else background
        logits = np.full((A, 10), 0.0, np.float32)
        logits[:, 9] = 8.0
        deltas = np.zeros((A, 4), np.float32)
        an = np.asarray(anchors)
        centers = (an[:, :2] + an[:, 2:]) / 2
        gt_c = (gt[:2] + gt[2:]) / 2
        near = np.argsort(((centers - gt_c) ** 2).sum(1))[:8]
        from tpudet3d.detect import encode_boxes as enc
        for rank, i in enumerate(near):
            noisy = gt + rng.uniform(-12, 12, 4).astype(np.float32)
            deltas[i] = np.asarray(enc(anchors[i], jnp.asarray(noisy)))
            logits[i, 9] = 0.0
            logits[i, 3] = 6.0 - 0.1 * rank
        plain = decode_detections(jnp.asarray(logits), jnp.asarray(deltas),
                                  anchors)
        voted = decode_detections(jnp.asarray(logits), jnp.asarray(deltas),
                                  anchors, box_vote_iou=0.5)
        p, v = np.asarray(plain), np.asarray(voted)
        # scores and ranking identical
        assert np.allclose(p[:, 4:], v[:, 4:])
        err_plain = np.abs(p[0, :4] - gt).mean()
        err_voted = np.abs(v[0, :4] - gt).mean()
        assert err_voted < err_plain

    def test_vote_off_is_identity(self):
        rng = np.random.RandomState(1)
        A = generate_anchors().shape[0]
        anchors = jnp.asarray(generate_anchors())
        logits = jnp.asarray(rng.randn(A, 10).astype(np.float32))
        deltas = jnp.asarray(rng.randn(A, 4).astype(np.float32) * 0.1)
        a = decode_detections(logits, deltas, anchors)
        b = decode_detections(logits, deltas, anchors, box_vote_iou=0.0)
        assert np.allclose(np.asarray(a), np.asarray(b))


class TestLoadDetector:

    def test_cascade_autodetect(self, tmp_path):
        from tpudet3d.detect import load_detector
        from tpudet3d.detect.train import create_detector_state
        from tpudet3d.utils.checkpoint import save_snap
        import optax
        for cascade in (False, True):
            model = SSDDetector(num_classes=9, width_mult=0.25,
                                cascade=cascade)
            state = create_detector_state(model, optax.sgd(0.1),
                                          jax.random.PRNGKey(0))
            d = str(tmp_path / f'det_{cascade}')
            save_snap(state, 0, d)
            loaded, det_vars = load_detector(f'{d}/snap_0',
                                             dtype=jnp.float32,
                                             width_mult=0.25)
            assert loaded.cascade == cascade
            assert ('reg2_heads_0' in det_vars['params']) == cascade
