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


def _components_stats(lab: np.ndarray, n: int):
    """Per-component (1..n) bounding-box centers, from a labeled image."""
    centers = []
    h, w = lab.shape
    ys, xs = np.nonzero(lab)
    vals = lab[ys, xs]
    min_x = np.full(n + 1, w, np.int64)
    min_y = np.full(n + 1, h, np.int64)
    max_x = np.full(n + 1, -1, np.int64)
    max_y = np.full(n + 1, -1, np.int64)
    np.minimum.at(min_x, vals, xs)
    np.minimum.at(min_y, vals, ys)
    np.maximum.at(max_x, vals, xs)
    np.maximum.at(max_y, vals, ys)
    for j in range(1, n + 1):
        bw = max_x[j] - min_x[j] + 1
        bh = max_y[j] - min_y[j] + 1
        centers.append((min_x[j] + bw / 2, min_y[j] + bh / 2))
    return centers


def _match_counts(pred_lab, n_pred, tar_lab, n_true, thresh, distance_thresh):
    """Greedy unique matching identical to the reference's loop
    (test.py:55-77), driven by precomputed pairwise stats:
    - intersections via one 2-D histogram of (pred component, tar component)
    - areas via bincount; IoU = inter / (areaP + areaT - inter)
    - bounding-box-center distances."""
    inter = np.zeros((n_pred + 1, n_true + 1), np.int64)
    np.add.at(inter, (pred_lab.ravel(), tar_lab.ravel()), 1)
    area_p = inter.sum(axis=1)
    area_t = inter.sum(axis=0)
    cp = _components_stats(pred_lab, n_pred)
    ct = _components_stats(tar_lab, n_true)

    used_i = np.zeros(n_true)
    used_d = np.zeros(n_true)
    n_corr_i = n_corr_d = 0
    for i in range(n_pred):
        found_i = found_d = False
        for j in range(n_true):
            union = area_p[i + 1] + area_t[j + 1] - inter[i + 1, j + 1]
            iou = inter[i + 1, j + 1] / union if union else 0.0
            dist = float(np.hypot(cp[i][0] - ct[j][0], cp[i][1] - ct[j][1]))
            if iou > thresh and not found_i and used_i[j] == 0:
                n_corr_i += 1
                found_i = True
                used_i[j] = 1
            if distance_thresh > dist and not found_d and used_d[j] == 0:
                n_corr_d += 1
                found_d = True
                used_d[j] = 1
    return n_corr_i, n_corr_d


def get_prec_recall(mask_pred: np.ndarray, mask_target: np.ndarray,
                    thresh: float, distance_thresh: float) -> Tuple[float, float]:
    """mask_pred/mask_target: (C, B, H, W) 0/1 arrays. Returns
    ((precI+recI)/2, (precD+recD)/2) averaged over foreground classes+batch.

    Matching semantics are the reference's exactly (greedy unique matching,
    empty sets count as 1 — test.py:28-89) but pairwise IoUs come from a
    single (pred-component x tar-component) histogram per image instead of
    O(nPred * nTrue) full-mask passes."""
    n_class, b_size = mask_pred.shape[:2]
    prec_i = rec_i = prec_d = rec_d = 0.0
    for c in range(1, n_class):
        for b in range(b_size):
            n_pred, pred_lab = _connected_components(mask_pred[c, b])
            n_true, tar_lab = _connected_components(mask_target[c, b])
            n_corr_i, n_corr_d = _match_counts(pred_lab, n_pred, tar_lab,
                                               n_true, thresh, distance_thresh)
            prec_i += n_corr_i / n_pred if n_pred else 1
            rec_i += n_corr_i / n_true if n_true else 1
            prec_d += n_corr_d / n_pred if n_pred else 1
            rec_d += n_corr_d / n_true if n_true else 1
    prec_i /= max(n_class - 1, 1)
    rec_i /= max(n_class - 1, 1)
    prec_d /= max(n_class - 1, 1)
    rec_d /= max(n_class - 1, 1)
    return (prec_i + rec_i) / 2, (prec_d + rec_d) / 2


def get_prec_recall_multi(mask_pred: np.ndarray, mask_target: np.ndarray,
                          thresholds, distance_thresholds) -> np.ndarray:
    """All (thresh, dist) pairs at once, computing connected components and
    pairwise stats ONCE per class/image (the reference's eval loop recomputes
    them per threshold pair — test.py:171-174). Returns (2, len(thresholds)):
    row 0 = IoU-matched (prec+rec)/2, row 1 = distance-matched."""
    n_class, b_size = mask_pred.shape[:2]
    k = len(thresholds)
    out = np.zeros((2, k))
    for c in range(1, n_class):
        for b in range(b_size):
            n_pred, pred_lab = _connected_components(mask_pred[c, b])
            n_true, tar_lab = _connected_components(mask_target[c, b])
            inter = np.zeros((n_pred + 1, n_true + 1), np.int64)
            np.add.at(inter, (pred_lab.ravel(), tar_lab.ravel()), 1)
            area_p = inter.sum(axis=1)
            area_t = inter.sum(axis=0)
            cp = _components_stats(pred_lab, n_pred)
            ct = _components_stats(tar_lab, n_true)
            union = area_p[1:, None] + area_t[None, 1:] - inter[1:, 1:]
            iou = np.where(union > 0, inter[1:, 1:] / np.maximum(union, 1), 0.0)
            if n_pred and n_true:
                dist = np.hypot(
                    np.asarray([p[0] for p in cp])[:, None]
                    - np.asarray([t[0] for t in ct])[None, :],
                    np.asarray([p[1] for p in cp])[:, None]
                    - np.asarray([t[1] for t in ct])[None, :])
            else:
                dist = np.zeros((n_pred, n_true))
            for ti, (thresh, dthresh) in enumerate(zip(thresholds,
                                                       distance_thresholds)):
                n_corr_i = _greedy(iou > thresh)
                n_corr_d = _greedy(dist < dthresh) if n_pred and n_true else 0
                pi = n_corr_i / n_pred if n_pred else 1
                ri = n_corr_i / n_true if n_true else 1
                pd = n_corr_d / n_pred if n_pred else 1
                rd = n_corr_d / n_true if n_true else 1
                out[0, ti] += (pi + ri) / 2
                out[1, ti] += (pd + rd) / 2
    return out / max(n_class - 1, 1)


def _greedy(ok: np.ndarray) -> int:
    """Greedy unique matching count over a boolean (nPred, nTrue) matrix,
    identical to the reference's i-then-j scan order."""
    used = np.zeros(ok.shape[1], bool)
    n = 0
    for i in range(ok.shape[0]):
        for j in range(ok.shape[1]):
            if ok[i, j] and not used[j]:
                used[j] = True
                n += 1
                break
    return n


def get_prec_recall_naive(mask_pred: np.ndarray, mask_target: np.ndarray,
                          thresh: float, distance_thresh: float) -> Tuple[float, float]:
    """Direct transcription-style implementation (full-mask IoU per component
    pair); kept as the cross-check oracle for the fast path."""
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
