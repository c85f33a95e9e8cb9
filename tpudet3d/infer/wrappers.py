"""Split-stage inference wrappers: ``Detector`` / ``Regressor``.

API parity with the reference's OpenVINO wrappers
(torchdet3d/utils/ie_wrappers.py): ``Detector.run_async/wait_and_grab/
get_detections`` produce (l, t, r, b, conf, label) tuples with a confidence
threshold and expand-ratio; ``Regressor.get_detections(frame, detections)``
crops each detection and returns (kp, label) pairs decoded by the predicted
class head (:138-142).

The fused ``TwoStageEngine`` is the production path; these exist for
drop-in compatibility and for debugging the stages independently.  Each
stage is its own jitted program; the regressor stage batches all detections
of a frame into ONE forward (the reference loops one-by-one, :128-136).
"""

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..detect import generate_anchors, decode_detections, INPUT_SIZE
from ..ops.image import crop_and_resize, resize_bilinear
from .engine import REG_MEAN, REG_STD

__all__ = ['Detector', 'Regressor']


class Detector:
    """Stage-1 wrapper: frame → thresholded detections."""

    def __init__(self, model, variables, conf=.6, max_detections=32,
                 input_is_bgr=True, expand_ratio=(1., 1.)):
        self.model = model
        self.variables = variables
        self.confidence = conf
        self.expand_ratio = expand_ratio
        self.anchors = jnp.asarray(generate_anchors())
        self._pending = None

        # weights as arguments, not jit closures: lowering a closure over
        # on-device params fetches every leaf through the host link per
        # compiled shape (see infer/engine.py _build_pipelines)
        @partial(jax.jit, static_argnames=('h', 'w'))
        def forward(variables, frame_u8, h, w):
            frame = frame_u8.astype(jnp.float32)
            if input_is_bgr:
                frame = frame[..., ::-1]
            det_in = resize_bilinear(frame, (INPUT_SIZE, INPUT_SIZE)) / 255.0
            logits, deltas = self.model.apply(variables, det_in[None],
                                              train=False)
            dets = decode_detections(logits[0], deltas[0], self.anchors,
                                     max_per_img=max_detections,
                                     pre_nms_k=4 * max_detections)
            scale = jnp.asarray([w / INPUT_SIZE, h / INPUT_SIZE,
                                 w / INPUT_SIZE, h / INPUT_SIZE], jnp.float32)
            return dets.at[:, :4].multiply(scale)

        self._forward = forward

    def run_async(self, frame):
        self.frame_shape = frame.shape
        h, w = frame.shape[:2]
        self._pending = self._forward(self.variables, jnp.asarray(frame),
                                      h, w)

    def wait_and_grab(self):
        assert self._pending is not None
        dets = np.asarray(jax.device_get(self._pending))
        self._pending = None
        return self._decode(dets, self.frame_shape)

    def get_detections(self, frame):
        self.run_async(frame)
        return self.wait_and_grab()

    def _decode(self, dets, frame_shape):
        """[(left, top, right, bottom, conf, label), ...] above threshold,
        expand-ratio applied (reference ie_wrappers.py:94-120)."""
        out = []
        h, w = frame_shape[:2]
        for x0, y0, x1, y1, conf, label in dets:
            if conf <= self.confidence:
                continue
            if self.expand_ratio != (1., 1.):
                bw, bh = x1 - x0, y1 - y0
                dw = bw * (self.expand_ratio[0] - 1.) / 2
                dh = bh * (self.expand_ratio[1] - 1.) / 2
                x0, x1 = max(x0 - dw, 0), x1 + dw
                y0, y1 = max(y0 - dh, 0), y1 + dh
            out.append((int(max(x0, 0)), int(max(y0, 0)),
                        int(min(x1, w)), int(min(y1, h)),
                        float(conf), int(label)))
        out.sort(key=lambda d: d[1], reverse=True)
        return out


class Regressor:
    """Stage-2 wrapper: frame + detections → [(kp [9,2], label), ...]."""

    def __init__(self, model, variables, crop_size=(224, 224),
                 max_batch=16, input_is_bgr=True):
        self.model = model
        self.variables = variables
        self.crop_size = crop_size
        self.max_batch = max_batch

        @partial(jax.jit, static_argnames=('h', 'w'))
        def forward(variables, frame_u8, boxes, h, w):
            frame = frame_u8.astype(jnp.float32)
            if input_is_bgr:
                frame = frame[..., ::-1]
            crops = crop_and_resize(frame, boxes, crop_size)
            mean = jnp.asarray(REG_MEAN, jnp.float32) * 255
            std = jnp.asarray(REG_STD, jnp.float32) * 255
            crops = (crops - mean) / std
            all_kp, logits = self.model.apply(variables, crops,
                                              export=True)
            labels = jnp.argmax(logits, axis=-1)
            kp = all_kp[labels, jnp.arange(labels.shape[0])]
            return kp, labels

        self._forward = forward

    def get_detections(self, frame, detections):
        """Batch ALL detections into one forward (reference loops serially,
        ie_wrappers.py:128-136)."""
        if not len(detections):
            return []
        n = len(detections)
        boxes = np.zeros((self.max_batch, 4), np.float32)
        for i, det in enumerate(detections[:self.max_batch]):
            boxes[i] = det[:4]
        h, w = frame.shape[:2]
        kp, labels = self._forward(self.variables,
                                   jnp.asarray(frame), jnp.asarray(boxes),
                                   h, w)
        kp = np.asarray(kp)
        labels = np.asarray(labels)
        return [(kp[i], int(labels[i])) for i in range(min(n, self.max_batch))]

    @staticmethod
    def transform_kp(kp, crop_cords):
        """[0,1] crop coords → frame pixels (reference :144-152)."""
        x0, y0, x1, y1 = crop_cords
        kp[:, 0] = kp[:, 0] * (x1 - x0) + x0
        kp[:, 1] = kp[:, 1] * (y1 - y0) + y0
        return kp
