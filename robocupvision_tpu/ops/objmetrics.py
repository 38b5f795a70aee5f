"""Object-level precision/recall (reference test.py:28-89).

Per foreground class and image: connected components of prediction and
target masks, greedy unique matching by (a) mask IoU > thresh and (b)
bounding-box-centroid distance < distanceThresh; per-image averages of
(precision+recall)/2 for both criteria. Empty prediction/target sets count
as precision/recall 1 (the reference's convention).

Connected components run on host (cv2 when present, else a scipy/pure-numpy
fallback) — this is an eval-only path; the device loop never blocks on it.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2  # type: ignore

    def _connected_components(mask: np.ndarray) -> Tuple[int, np.ndarray]:
        n, lab = cv2.connectedComponents(mask.astype(np.uint8))
        return n - 1, lab

    def _bounding_rect(mask: np.ndarray) -> Tuple[int, int, int, int]:
        x, y, w, h = cv2.boundingRect(mask.astype(np.uint8))
        return x, y, w, h
except ImportError:  # pragma: no cover
    from scipy import ndimage

    def _connected_components(mask: np.ndarray) -> Tuple[int, np.ndarray]:
        lab, n = ndimage.label(mask)
        return n, lab

    def _bounding_rect(mask: np.ndarray):
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            return 0, 0, 0, 0
        return int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1), \
            int(ys.max() - ys.min() + 1)


def get_prec_recall(mask_pred: np.ndarray, mask_target: np.ndarray,
                    thresh: float, distance_thresh: float) -> Tuple[float, float]:
    """mask_pred/mask_target: (C, B, H, W) 0/1 arrays. Returns
    ((precI+recI)/2, (precD+recD)/2) averaged over foreground classes+batch."""
    n_class, b_size = mask_pred.shape[:2]
    prec_i = rec_i = prec_d = rec_d = 0.0
    for c in range(1, n_class):
        for b in range(b_size):
            img_pred = mask_pred[c, b]
            img_tar = mask_target[c, b]
            n_pred, pred_lab = _connected_components(img_pred)
            n_true, tar_lab = _connected_components(img_tar)

            used_i = np.zeros(n_true)
            used_d = np.zeros(n_true)
            n_corr_i = n_corr_d = 0

            # precompute target boxes/masks once per image
            tars = []
            for j in range(n_true):
                t = tar_lab == (j + 1)
                tx, ty, tw, th = _bounding_rect(t)
                tars.append((t, (tx + tw / 2, ty + th / 2)))

            for i in range(n_pred):
                pred = pred_lab == (i + 1)
                px, py, pw, ph = _bounding_rect(pred)
                pc = (px + pw / 2, py + ph / 2)
                found_i = found_d = False
                for j, (tar, tc) in enumerate(tars):
                    dist = float(np.hypot(pc[0] - tc[0], pc[1] - tc[1]))
                    union = np.logical_or(pred, tar).sum()
                    iou = np.logical_and(pred, tar).sum() / union if union else 0.0
                    if iou > thresh and not found_i and used_i[j] == 0:
                        n_corr_i += 1
                        found_i = True
                        used_i[j] = 1
                    if distance_thresh > dist and not found_d and used_d[j] == 0:
                        n_corr_d += 1
                        found_d = True
                        used_d[j] = 1

            prec_i += n_corr_i / n_pred if n_pred else 1
            rec_i += n_corr_i / n_true if n_true else 1
            prec_d += n_corr_d / n_pred if n_pred else 1
            rec_d += n_corr_d / n_true if n_true else 1

    # NOTE: the reference divides by (nClass-1) only — its per-image loop
    # accumulates over bSize without normalizing (test.py:84-87); callers
    # divide by imgCnt at the end. We do the same: divide by (nClass-1).
    prec_i /= max(n_class - 1, 1)
    rec_i /= max(n_class - 1, 1)
    prec_d /= max(n_class - 1, 1)
    rec_d /= max(n_class - 1, 1)
    return (prec_i + rec_i) / 2, (prec_d + rec_d) / 2
