"""Coherent full-frame synthetic scenes with exact 3D geometry.

One generator drives the WHOLE two-stage system: each scene is a set of
3D boxes standing on a shared ground plane, projected through the default
Objectron camera (ops/geometry.py) and rendered class-colored into the
frame.  From the same sample we derive

* detector training items   (frame, 2D boxes from keypoint extents) —
  the converter's box-from-keypoints semantics
  (/root/reference/annotation_converters/objectron_2_coco.py:58-82);
* regressor training items  (GT-box ±10 px crop, keypoints in crop pixels) —
  the dataset crop semantics
  (/root/reference/torchdet3d/dataloaders/objectron_main.py:98-137);
* protocol eval shards      (tf.train.Example TFRecords with image/encoded,
  point_2d, point_3d, instance_num, visibility, plane) — the eval ingestion
  schema (/root/reference/scripts/objectron_eval.py:84-95).

Because the 3D ground truth is exact and the bottom face of every box lies
ON the plane, the full vendor pipeline — EPnP lift (portrait convention) +
ground-plane scale recovery + 3D IoU/ADD/viewpoint APs — is meaningful:
a perfect 2D prediction recovers the exact 3D box.

2D convention: ``point_2d = (s_y, s_x)`` of the pinhole projection, i.e.
the PORTRAIT frame convention, matching the ``lift_2d(..., portrait=True)``
call in the protocol CLI (reference objectron_eval.py:79; ours
scripts/objectron_eval.py).  Rendered pixel column = point_2d[...,0]*W,
row = point_2d[...,1]*H, so engine predictions (normalized by frame size)
and GT live in the same coordinates.
"""

import struct

import numpy as np

from ..core import OBJECTRON_CLASSES, DETECTOR_TO_REGRESSOR_CLS
from .detection_dataset import _pad_boxes, MAX_BOXES

try:
    import cv2 as cv
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

__all__ = ['SyntheticScene', 'SceneDetection', 'SceneCrops',
           'write_eval_shards']

# regressor class id -> detector class id (camera/cereal_box swap,
# SURVEY.md §8.1)
REGRESSOR_TO_DETECTOR_CLS = tuple(
    DETECTOR_TO_REGRESSOR_CLS.index(i)
    for i in range(len(DETECTOR_TO_REGRESSOR_CLS)))

_PALETTE = np.asarray(
    [[230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
     [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
     [128, 128, 0]], np.uint8)

# vertex order matching EPNP_ALPHA: x slowest, then y, then z
_CORNER_SIGNS = np.array([[sx, sy, sz] for sx in (-1, 1)
                          for sy in (-1, 1) for sz in (-1, 1)], np.float64)


def _unit(v):
    return v / np.linalg.norm(v)


def _pinhole(points):
    """Camera-space points (z<0) → [0,1] screen coords with principal point
    0.5: s = p_xy/(-z) + 0.5.  This is the screen convention the EPnP lift
    inverts (ops/geometry.py NDC camera: u = 2X/(-Z) = 2s-1); note
    ``project_3d_points`` is the reference's matmul form, whose
    principal-point term lands as -0.5 for z<0 — a different convention."""
    points = np.asarray(points, np.float64)
    return points[..., :2] / (-points[..., 2:3]) + 0.5


class SyntheticScene:
    """Procedural scenes: N upright boxes on one ground plane, exact
    camera-space 3D keypoints + portrait-convention 2D keypoints."""

    def __init__(self, length=256, frame_hw=(480, 640), seed=23,
                 min_objects=1, max_objects=3, classes=None,
                 clutter=True, cache_dir=''):
        self.length = length
        self.frame_hw = tuple(frame_hw)
        self.seed = seed
        self.min_objects = min_objects
        self.max_objects = max_objects
        # regressor-order class ids this generator may emit
        self.classes = (tuple(range(len(OBJECTRON_CLASSES)))
                        if classes is None else tuple(classes))
        self.clutter = clutter
        # Optional on-disk cache (config data.scene_cache): scenes are
        # deterministic per (seed, idx) but cost ~25 ms to render on this
        # 1-core host, which makes training loader-bound (~2 s/step at
        # batch 128 vs a 16 ms device step).  Cached items re-load
        # losslessly in ~10 ms (PNG frame + exact float keypoints in one
        # npz), so cached and uncached runs are bit-identical.
        self.cache_dir = str(cache_dir or '')
        if self.cache_dir:
            import os
            os.makedirs(self.cache_dir, exist_ok=True)

    def __len__(self):
        return self.length

    def _sample_plane(self, rng):
        normal = _unit(np.array([rng.uniform(-0.12, 0.12), 1.0,
                                 rng.uniform(-0.12, 0.12)]))
        foot = np.array([0.0, rng.uniform(-1.1, -0.7),
                         rng.uniform(-2.8, -2.0)])
        t1 = _unit(np.cross(normal, np.array([0.0, 0.0, 1.0])))
        t2 = np.cross(normal, t1)
        return foot, normal, t1, t2

    def _sample_object(self, rng, plane):
        """One upright box with its bottom face ON the plane → (kps3d [9,3],
        kps2d [9,2] portrait-normalized) or None if out of frame."""
        foot0, normal, t1, t2 = plane
        half = rng.uniform(0.10, 0.28, size=3)           # hx, hy, hz
        yaw = rng.uniform(-np.pi, np.pi)
        ax = np.cos(yaw) * t1 + np.sin(yaw) * t2         # box x-axis
        ay = normal                                      # box y-axis (up)
        az = np.cross(ax, ay)                            # box z-axis
        rot = np.stack([ax, ay, az], axis=1)             # columns = axes
        foot = foot0 + t1 * rng.uniform(-1.0, 1.0) + t2 * rng.uniform(-0.6, 0.6)
        center = foot + normal * half[1]                 # bottom face on plane
        verts = center + (_CORNER_SIGNS * half) @ rot.T
        kps3d = np.concatenate([center[None], verts], axis=0)
        if np.any(kps3d[:, 2] >= -0.2):
            return None
        kps2d = _pinhole(kps3d)[:, ::-1].copy()          # (s_y, s_x): portrait
        if np.any(kps2d < 0.04) or np.any(kps2d > 0.96):
            return None
        extent = kps2d.max(0) - kps2d.min(0)
        if min(extent) < 0.12 or max(extent) > 0.85:     # detectable scale
            return None
        return kps3d, kps2d

    def sample(self, idx):
        """→ dict(img [H,W,3] BGR u8, kps2d [N,9,2] normalized,
        kps3d [N,9,3], labels [N] regressor-order, plane (center, normal))."""
        if self.cache_dir:
            cached = self._cache_load(idx)
            if cached is not None:
                return cached
        out = self._render_sample(idx)
        if self.cache_dir:
            self._cache_store(idx, out)
        return out

    _CACHE_VERSION = 1   # bump when _render_sample's output changes

    def _cache_path(self, idx):
        import hashlib
        import os.path as osp
        h, w = self.frame_hw
        # every generation parameter participates in the key: a stale
        # entry from a differently-configured generator must never be
        # served (silently wrong labels/objects)
        cfg = (self._CACHE_VERSION, self.seed, self.frame_hw,
               self.min_objects, self.max_objects, self.classes,
               self.clutter)
        tag = hashlib.sha1(repr(cfg).encode()).hexdigest()[:10]
        return osp.join(self.cache_dir,
                        f's{self.seed}_{h}x{w}_{tag}_{idx}.npz')

    def _cache_load(self, idx):
        import os.path as osp
        path = self._cache_path(idx)
        if not osp.exists(path):
            return None
        try:
            z = np.load(path)
            img = cv.imdecode(z['png'], cv.IMREAD_COLOR)
            if img is None:     # corrupt payload: fall back to re-render
                return None
            return dict(img=img, kps2d=z['kps2d'], kps3d=z['kps3d'],
                        labels=z['labels'],
                        plane=(z['plane_c'], z['plane_n']))
        except Exception:       # truncated write from a dead process
            return None

    def _cache_store(self, idx, s):
        import os
        import tempfile
        ok, enc = cv.imencode('.png', s['img'],
                              [cv.IMWRITE_PNG_COMPRESSION, 1])
        if not ok:              # pragma: no cover
            return
        path = self._cache_path(idx)
        fd, tmp = tempfile.mkstemp(dir=self.cache_dir, suffix='.tmp')
        with os.fdopen(fd, 'wb') as f:
            np.savez(f, png=enc, kps2d=s['kps2d'], kps3d=s['kps3d'],
                     labels=s['labels'], plane_c=s['plane'][0],
                     plane_n=s['plane'][1])
        os.replace(tmp, path)   # atomic: loader threads never see partials

    def _render_sample(self, idx):
        rng = np.random.RandomState(self.seed * 700001 + idx)
        h, w = self.frame_hw
        img = rng.randint(0, 56, size=(h, w, 3)).astype(np.uint8)
        plane = self._sample_plane(rng)
        objs = []
        n_target = rng.randint(self.min_objects, self.max_objects + 1)
        for attempt in range(400):
            if len(objs) == n_target:
                break
            if not objs and attempt and attempt % 40 == 0:
                plane = self._sample_plane(rng)   # unlucky plane: resample
            got = self._sample_object(rng, plane)
            if got is not None:
                objs.append(got)
        if not objs:                                     # pragma: no cover
            raise RuntimeError('SyntheticScene: no placeable object in 400 '
                               'attempts — acceptance region is empty')
        labels = [int(self.classes[rng.randint(0, len(self.classes))])
                  for _ in objs]
        if _HAS_CV2:
            self._render(rng, img, objs, labels, plane)
        kps3d = np.stack([o[0] for o in objs]).astype(np.float32)
        kps2d = np.stack([o[1] for o in objs]).astype(np.float32)
        return dict(img=img, kps2d=kps2d, kps3d=kps3d,
                    labels=np.asarray(labels, np.int32),
                    plane=(plane[0].astype(np.float32),
                           plane[1].astype(np.float32)))

    def _render(self, rng, img, objs, labels, plane):
        from ..utils.drawing import EDGES
        h, w = self.frame_hw
        # ground quad for context
        foot, normal, t1, t2 = plane
        quad3d = np.stack([foot + t1 * sx * 1.6 + t2 * sz * 1.2
                           for sx, sz in ((-1, -1), (-1, 1), (1, 1), (1, -1))])
        if np.all(quad3d[:, 2] < -0.05):
            q2d = _pinhole(quad3d)
            qpx = np.clip((q2d[:, ::-1] * [w, h]), -4 * w, 4 * w).astype(int)
            cv.fillConvexPoly(img, qpx.reshape(-1, 1, 2), (70, 75, 70))
        if self.clutter:
            for _ in range(rng.randint(2, 6)):
                c = int(rng.randint(90, 150))
                cv.circle(img, (int(rng.randint(0, w)), int(rng.randint(0, h))),
                          int(rng.randint(6, 28)), (c, c, c), -1)
        # painter's order: farther objects first
        order = np.argsort([o[0][0, 2] for o in objs])
        for i in order:
            kps2d, label = objs[i][1], labels[i]
            pts = (kps2d * np.asarray([w, h])).astype(int)
            color = tuple(int(c) for c in _PALETTE[label])
            dim = tuple(int(c * 0.45) for c in _PALETTE[label])
            hull = cv.convexHull(pts[1:].reshape(-1, 1, 2))
            cv.fillConvexPoly(img, hull, dim)
            thickness = max(int(round(min(h, w) / 160)), 2)
            for a, b in EDGES:
                cv.line(img, tuple(pts[a]), tuple(pts[b]), color, thickness)
            cv.circle(img, tuple(pts[0]), thickness + 1, (255, 255, 255), -1)
            for v in range(1, 9):       # distinct vertex markers (see
                shade = int(30 + 25 * v)  # SyntheticObjectron rationale)
                cv.circle(img, tuple(pts[v]), thickness + 1,
                          (shade, 255 - shade, 255 if v % 2 else 80), -1)


class SceneDetection:
    """Detector items over SyntheticScene: (img, boxes, labels, valid) with
    boxes = 2D keypoint extents in input-size pixels, detector class order."""

    def __init__(self, scene: SyntheticScene, input_size=300,
                 max_boxes=MAX_BOXES):
        self.scene = scene
        self.input_size = input_size
        self.max_boxes = max_boxes

    def __len__(self):
        return len(self.scene)

    def __getitem__(self, idx):
        s = self.scene.sample(idx)
        size = self.input_size
        img = cv.resize(s['img'], (size, size),
                        interpolation=cv.INTER_LINEAR) if _HAS_CV2 \
            else np.zeros((size, size, 3), np.uint8)
        lo = s['kps2d'].min(axis=1) * size                # [N, 2]
        hi = s['kps2d'].max(axis=1) * size
        boxes = np.concatenate([lo, hi], axis=1).astype(np.float32)
        labels = np.asarray([REGRESSOR_TO_DETECTOR_CLS[int(l)]
                             for l in s['labels']], np.int32)
        return (img,) + _pad_boxes(boxes, labels, self.max_boxes)


class SceneCrops:
    """Regressor items over SyntheticScene: one object per index, GT-box
    ±10 px crop → resize, keypoints in resized-crop pixels (the Objectron
    dataset crop semantics, reference objectron_main.py:98-137).  Drop-in
    for ``Objectron``/``SyntheticObjectron``: train/val items are
    (crop, kps, cat); test items add the original frame + crop coords."""

    def __init__(self, scene: SyntheticScene, resize=(224, 224),
                 objects_per_scene=2, mode='train', det_boxes='',
                 selflabel_p=0.5, selflabel_margin=10.0):
        self.scene = scene
        self.resize = tuple(resize)
        self.objects_per_scene = objects_per_scene
        self.mode = mode
        self._epoch = 0
        # Self-labeled deploy-distribution crops (data/selflabel.py): with
        # probability ``selflabel_p`` a train item crops from the trained
        # detector's matched predicted box + the engine's deploy margin
        # (EngineConfig.crop_margin_px) instead of the GT extent — the
        # measured round-2 chain bottleneck was exactly this train/deploy
        # crop-distribution mismatch (BASELINE.md).
        self.selflabel_p = float(selflabel_p)
        self.selflabel_margin = float(selflabel_margin)
        self._det_boxes = self._det_valid = None
        if det_boxes and mode == 'train':
            from .selflabel import load_selflabel_boxes
            self._det_boxes, self._det_valid = \
                load_selflabel_boxes(det_boxes, scene)

    def set_epoch(self, epoch):
        """Called by BatchLoader per epoch: varies the train-mode crop
        jitter (jitter_margins) deterministically."""
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.scene) * self.objects_per_scene

    def __getitem__(self, idx):
        s = self.scene.sample(idx // self.objects_per_scene)
        n = len(s['labels'])
        k = (idx % self.objects_per_scene) % n
        h, w = s['img'].shape[:2]
        kps_px = s['kps2d'][k] * np.asarray([w, h], np.float32)
        # Objectron.crop semantics: clip to [3, dim-3], extent ±10 px
        clipped = np.stack([np.clip(kps_px[:, 0], 3, w - 3),
                            np.clip(kps_px[:, 1], 3, h - 3)],
                           axis=1).astype(np.float32)
        # Train mode jitters the per-side crop margin around the reference's
        # fixed 10 px (objectron_main.py:107-110) so deployment crops taken
        # from NOISY detector boxes stay in-distribution; val/test keep the
        # exact reference semantics for metric comparability.  Draws vary
        # per epoch (BatchLoader.set_epoch) but stay deterministic.
        det_box = None
        if self.mode == 'train' and self._det_boxes is not None:
            scene_idx = idx // self.objects_per_scene
            if self._det_valid[scene_idx, k]:
                draw = np.random.RandomState(
                    (self.scene.seed * 99991 + idx * 31
                     + self._epoch * 7919) & 0x7fffffff).uniform()
                if draw < self.selflabel_p:
                    det_box = self._det_boxes[scene_idx, k]
        if det_box is not None:
            # deploy geometry (infer/engine.py pipeline_core): detector box
            # + crop_margin_px on every side, clipped to the frame
            m = self.selflabel_margin
            x0 = int(np.clip(det_box[0] - m, 0, w))
            y0 = int(np.clip(det_box[1] - m, 0, h))
            x1 = int(np.clip(det_box[2] + m, 0, w))
            y1 = int(np.clip(det_box[3] + m, 0, h))
            if x1 - x0 < 8 or y1 - y0 < 8:   # degenerate box: GT fallback
                det_box = None
        if det_box is None:
            if self.mode == 'train':
                from .dataset import jitter_margins
                ml, mt, mr, mb = jitter_margins(self.scene.seed, idx,
                                                self._epoch)
            else:
                ml = mt = mr = mb = 10.0
            x0 = int(np.clip(clipped[:, 0].min() - ml, 0, w))
            y0 = int(np.clip(clipped[:, 1].min() - mt, 0, h))
            x1 = int(np.clip(clipped[:, 0].max() + mr, 0, w))
            y1 = int(np.clip(clipped[:, 1].max() + mb, 0, h))
        crop_img = s['img'][y0:y1, x0:x1]
        crop_kps = clipped - np.asarray([x0, y0], np.float32)
        if det_box is not None:
            # a detector box may truncate the object; the regressor's
            # sigmoid output lives in the crop, so clip labels into it —
            # the best attainable prediction at deploy time
            crop_kps = np.stack(
                [np.clip(crop_kps[:, 0], 0, x1 - x0),
                 np.clip(crop_kps[:, 1], 0, y1 - y0)], axis=1)
        th, tw = self.resize
        ch, cw = crop_img.shape[:2]
        resized = cv.resize(crop_img, (tw, th),
                            interpolation=cv.INTER_LINEAR)
        out_kps = crop_kps * np.asarray([tw / cw, th / ch], np.float32)
        if self.mode == 'test':
            return (s['img'], resized, out_kps, int(s['labels'][k]),
                    (x0, y0, x1, y1))
        return resized, out_kps, int(s['labels'][k])


# --- tf.train.Example wire-format encoding (schema: reference
# objectron_eval.py:84-95 feature keys) ------------------------------------

def _varint(v):
    out = b''
    while True:
        b7 = v & 0x7f
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def _feat_bytes(vals):
    body = b''.join(_varint(1 << 3 | 2) + _varint(len(v)) + v for v in vals)
    return _varint(1 << 3 | 2) + _varint(len(body)) + body


def _feat_floats(vals):
    packed = b''.join(struct.pack('<f', float(v)) for v in vals)
    body = _varint(1 << 3 | 2) + _varint(len(packed)) + packed
    return _varint(2 << 3 | 2) + _varint(len(body)) + body


def _feat_ints(vals):
    body = b''.join(_varint(1 << 3 | 0) + _varint(int(v)) for v in vals)
    return _varint(3 << 3 | 2) + _varint(len(body)) + body


def _example(features):
    body = b''
    for name, feat in features.items():
        entry = _varint(1 << 3 | 2) + _varint(len(name)) + name.encode()
        entry += _varint(2 << 3 | 2) + _varint(len(feat)) + feat
        body += _varint(1 << 3 | 2) + _varint(len(entry)) + entry
    return _varint(1 << 3 | 2) + _varint(len(body)) + body


def write_eval_shards(out_dir, classes, per_class=32, frame_hw=(480, 640),
                      seed=51, min_objects=1, max_objects=3):
    """Write per-class TFRecord shards with the feature keys/types read by
    scripts/objectron_eval.py (image/encoded, point_2d, point_3d,
    instance_num, object/visibility, plane/*).  The wire framing carries
    real masked CRC32C checksums, so tf.data.TFRecordDataset (the vendor
    reader, reference objectron_eval.py:273-275) consumes these shards too
    — pinned by tests/test_synthetic_scene.py.  Camera-projection features
    (the vendor encoder's parse_camera keys) are NOT written: nothing in
    either protocol CLI consumes them on these normalized-camera scenes."""
    import os
    import os.path as osp
    for ci, cls in enumerate(classes):
        cls_id = OBJECTRON_CLASSES.index(cls)
        scene = SyntheticScene(length=per_class, frame_hw=frame_hw,
                               seed=seed + 131 * ci, classes=(cls_id,),
                               min_objects=min_objects,
                               max_objects=max_objects)
        cls_dir = osp.join(out_dir, cls)
        os.makedirs(cls_dir, exist_ok=True)
        path = osp.join(cls_dir, 'shard-00000')
        with open(path, 'wb') as f:
            for i in range(per_class):
                s = scene.sample(i)
                ok, enc = cv.imencode('.jpg', s['img'],
                                      [cv.IMWRITE_JPEG_QUALITY, 95])
                assert ok
                n = len(s['labels'])
                # point_2d rows are (x, y, depth) triplets in the Objectron
                # schema; depth is unused by the protocol readers
                p2 = np.concatenate(
                    [s['kps2d'], np.zeros((n, 9, 1), np.float32)], axis=-1)
                ex = _example({
                    'image/encoded': _feat_bytes([enc.tobytes()]),
                    'point_2d': _feat_floats(p2.reshape(-1).tolist()),
                    'point_3d': _feat_floats(
                        s['kps3d'].reshape(-1).tolist()),
                    'instance_num': _feat_ints([n]),
                    'object/visibility': _feat_floats([1.0] * n),
                    'plane/center': _feat_floats(s['plane'][0].tolist()),
                    'plane/normal': _feat_floats(s['plane'][1].tolist()),
                })
                from ..core.crc32c import tfrecord_frame
                f.write(tfrecord_frame(ex))
