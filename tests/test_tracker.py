"""Host tracker + native assignment tests."""

import numpy as np

from tpudet3d.infer import IOUTracker, Track
from tpudet3d.native import linear_assignment, giou_cost_matrix


class TestNativeOps:

    def test_assignment_matches_scipy(self):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.RandomState(0)
        for shape in [(3, 3), (5, 2), (2, 6)]:
            cost = rng.rand(*shape)
            r1, c1 = linear_assignment(cost)
            r2, c2 = linear_sum_assignment(cost)
            assert abs(cost[r1, c1].sum() - cost[r2, c2].sum()) < 1e-9

    def test_giou_cost_identity(self):
        box = np.array([[0., 0., 10., 10.]])
        cost = giou_cost_matrix(box, box)
        assert abs(cost[0, 0]) < 1e-9  # GIoU 1 → cost 0


class TestTracker:

    def _kp(self, seed=0):
        return np.random.RandomState(seed).rand(18).tolist()

    def test_track_continuity_and_id(self):
        tracker = IOUTracker(time_window=2, continue_time_thresh=2)
        box = (10, 10, 60, 60)
        for t in range(5):
            b = tuple(v + t for v in box)   # slow drift
            tracker.process(None, [b], [self._kp(t)])
        objs = tracker.get_tracked_objects()
        assert len(objs) == 1
        assert objs[0].label == 'ID 0'

    def test_new_object_gets_new_id(self):
        tracker = IOUTracker(time_window=1)
        tracker.process(None, [(0, 0, 10, 10)], [self._kp(0)])
        tracker.process(None, [(0, 0, 10, 10), (100, 100, 140, 140)],
                        [self._kp(0), self._kp(1)])
        tracker.process(None, [(0, 0, 10, 10), (100, 100, 140, 140)],
                        [self._kp(0), self._kp(1)])
        ids = sorted(o.label for o in tracker.get_tracked_objects())
        assert len(ids) == 2 and ids[0] != ids[1]

    def test_kp_ema_smoothing(self):
        tracker = IOUTracker(time_window=1, keypoints_filter_speed=0.3,
                             add_treshold=0.5)
        kp0 = np.zeros(18)
        kp1 = np.full(18, 0.1)
        tracker.process(None, [(0, 0, 10, 10)], [kp0.tolist()])
        tracker.process(None, [(0, 0, 10, 10)], [kp1.tolist()])
        track = tracker.get_tracks()[0]
        # EMA: 0.7*0 + 0.3*0.1 = 0.03
        assert np.allclose(track.last_kp, 0.03)

    def test_kp_hold_on_jump(self):
        tracker = IOUTracker(time_window=1, add_treshold=0.05)
        kp0 = np.zeros(18)
        kp_jump = np.full(18, 0.9)
        tracker.process(None, [(0, 0, 10, 10)], [kp0.tolist()])
        tracker.process(None, [(0, 0, 10, 10)], [kp_jump.tolist()])
        track = tracker.get_tracks()[0]
        assert np.allclose(track.last_kp, 0.0)   # held previous estimate
