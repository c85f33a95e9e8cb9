"""Detector mAP evaluator tests."""

import numpy as np

from tpudet3d.detect.eval import average_precision


class TestAP:

    def test_perfect(self):
        ap = average_precision([0.9, 0.8], [True, True], 2)
        assert abs(ap - 1.0) < 1e-9

    def test_half(self):
        # one TP at top, one FP, one missed GT → precision 1 @ recall .5
        ap = average_precision([0.9, 0.8], [True, False], 2)
        assert abs(ap - 0.5) < 1e-9

    def test_order_matters(self):
        # FP ranked above TP lowers AP
        hi = average_precision([0.9, 0.8], [True, False], 1)
        lo = average_precision([0.9, 0.8], [False, True], 1)
        assert hi > lo

    def test_empty(self):
        assert average_precision([], [], 0) == 0.0
        assert average_precision([0.5], [False], 0) == 0.0
