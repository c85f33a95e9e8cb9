"""Keypoint / 3D-box overlay drawing (host-side, cv2).

Replaces the vendor ``objectron.dataset.graphics.draw_annotation_on_image``
used by the reference (torchdet3d/utils/utils.py:247-270).  The 9-keypoint
convention: index 0 = center, 1..8 = box vertices in ±e1±e2±e3 binary order.
"""

import numpy as np

try:
    import cv2 as cv
    _HAS_CV2 = True
except ImportError:  # pragma: no cover - cv2 is present in this image
    _HAS_CV2 = False

__all__ = ['EDGES', 'draw_kp', 'draw_boxes', 'normalize_kp', 'unnormalize_kp',
           'unnormalize_img']

# vertex-index pairs (1-based, into the 9-kp array) forming the box wireframe
EDGES = ((1, 2), (1, 3), (1, 5), (2, 4), (2, 6), (3, 4), (3, 7), (4, 8),
         (5, 6), (5, 7), (6, 8), (7, 8))


def normalize_kp(image_shape, unnormalized_keypoints):
    """Pixel coords → [0,1] (reference utils.py:231-240)."""
    h, w = image_shape[:2]
    return np.asarray(unnormalized_keypoints, np.float32) / np.asarray(
        [w, h], np.float32)


def unnormalize_kp(image_shape, normalized_keypoints):
    """[0,1] → integer pixel coords (reference utils.py:220-229)."""
    h, w = image_shape[:2]
    return np.multiply(np.asarray(normalized_keypoints),
                       np.asarray([w, h], np.float32)).astype(int)


def unnormalize_img(img, mean=(0.5931, 0.4690, 0.4229),
                    std=(0.2471, 0.2214, 0.2157)):
    """Invert dataset normalization for visualization (HWC float in)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] == 3:  # CHW → HWC
        img = img.transpose(1, 2, 0)
    return img * (np.asarray(std) * 255) + np.asarray(mean) * 255


def draw_boxes(boxes=(), clips=(), colors=('r', 'b', 'g', 'k'),
               save_path='3d_boxes.png'):
    """Matplotlib 3D debug plot of vertex-list boxes
    (reference torchdet3d/utils/geometry.py:111-138)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(111, projection='3d')
    for i, b in enumerate(boxes):
        b = np.asarray(b)
        v = b[1:] if b.shape[0] == 9 else b   # accept 9-kp or 8-corner input
        ax.scatter(v[:, 0], v[:, 1], v[:, 2], c='r')
        for e0, e1 in EDGES:
            seg = np.stack([np.asarray(b)[e0], np.asarray(b)[e1]])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], linewidth=2,
                    c=colors[i % len(colors)])
    if len(clips):
        pts = np.asarray(clips)
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=100, c='k')
    ax.view_init(30, 12)
    plt.savefig(save_path)
    plt.close(fig)
    return save_path


def draw_kp(img, keypoints, name=None, normalized=True, RGB=True,
            num_keypoints=9, label=None):
    """Draw the 9-keypoint box wireframe on an image and optionally save it
    (reference utils.py:247-270 API)."""
    if not _HAS_CV2:
        raise RuntimeError('cv2 is required for drawing')
    img_copy = np.ascontiguousarray(np.asarray(img))
    if img_copy.shape[0] == 3:
        img_copy = np.transpose(img_copy, (1, 2, 0)).copy()
    if img_copy.dtype != np.uint8:
        img_copy = np.clip(img_copy, 0, 255).astype(np.uint8)
    if RGB:
        img_copy = cv.cvtColor(img_copy, cv.COLOR_RGB2BGR)
    kp = np.asarray(keypoints, np.float32).reshape(num_keypoints, 2)
    if normalized:
        kp = unnormalize_kp(img_copy.shape, kp)
    kp = kp.astype(int)
    for a, b in EDGES:
        cv.line(img_copy, tuple(kp[a]), tuple(kp[b]), (94, 218, 121), 2)
    for i, p in enumerate(kp):
        color = (0, 0, 255) if i == 0 else (255, 130, 0)
        cv.circle(img_copy, tuple(p), 4, color, -1)
    if label:
        cv.putText(img_copy, str(label), (10, 180), cv.FONT_HERSHEY_SIMPLEX,
                   1, (0, 255, 0), 2, cv.LINE_AA)
    if name:
        cv.imwrite(name, img_copy)
    return img_copy
