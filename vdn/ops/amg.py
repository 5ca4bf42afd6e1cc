"""Automatic-mask-generation utilities, numpy (reference sam2/utils/amg.py).

RLE encode/decode (column-major like the reference), stability scores,
point grids, crop boxes, mask->box, small-region removal (backed by the
native CCL kernel), and a simple IoU-based NMS replacing torchvision's
batched_nms.
"""

from __future__ import annotations

from typing import Any, Dict, Generator, List, Tuple

import numpy as np

from vdn.ops.connected_components import get_connected_components

__all__ = [
    "mask_to_rle", "rle_to_mask", "area_from_rle",
    "calculate_stability_score", "build_point_grid",
    "build_all_layer_point_grids", "generate_crop_boxes",
    "uncrop_boxes_xyxy", "uncrop_points", "uncrop_masks",
    "remove_small_regions", "batched_mask_to_box", "box_xyxy_to_xywh",
    "batch_iterator", "nms_boxes", "is_box_near_crop_edge",
]


def mask_to_rle(mask: np.ndarray) -> Dict[str, Any]:
    """Binary [H, W] -> uncompressed RLE, column-major starting with the
    count of 0s (reference amg.py:109-137)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # column-major
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(idx).tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """(reference amg.py:140-151)"""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx: idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).T


def area_from_rle(rle: Dict[str, Any]) -> int:
    return sum(rle["counts"][1::2])


def calculate_stability_score(mask_logits: np.ndarray,
                              mask_threshold: float,
                              threshold_offset: float) -> np.ndarray:
    """IoU between high/low-threshold binarizations
    (reference amg.py:158-178).  mask_logits [..., H, W]."""
    hi = (mask_logits > (mask_threshold + threshold_offset)).sum((-1, -2))
    lo = (mask_logits > (mask_threshold - threshold_offset)).sum((-1, -2))
    return hi.astype(np.float64) / np.maximum(lo, 1)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n^2, 2] normalized (x, y) grid (reference amg.py:181-188)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    return [build_point_grid(int(n_per_side / scale_per_layer ** i))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float
                        ) -> Tuple[List[List[int]], List[int]]:
    """(reference amg.py:202-236): xyxy crop boxes per layer."""
    boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(np.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * 2 / n_crops_per_side)
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        crop_box_x0 = [int((crop_w - overlap) * i)
                       for i in range(n_crops_per_side)]
        crop_box_y0 = [int((crop_h - overlap) * i)
                       for i in range(n_crops_per_side)]
        for x0 in crop_box_x0:
            for y0 in crop_box_y0:
                boxes.append([x0, y0, min(x0 + crop_w, im_w),
                              min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return boxes, layer_idxs


def uncrop_boxes_xyxy(boxes: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + np.array([[x0, y0, x0, y0]], boxes.dtype)


def uncrop_points(points: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return points + np.array([[x0, y0]], points.dtype)


def uncrop_masks(masks: np.ndarray, crop_box: List[int], orig_h: int,
                 orig_w: int) -> np.ndarray:
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    out = np.zeros((*masks.shape[:-2], orig_h, orig_w), masks.dtype)
    out[..., y0:y1, x0:x1] = masks
    return out


def remove_small_regions(mask: np.ndarray, area_thresh: float,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """Remove small 'holes' or 'islands' (reference amg.py:269-293),
    backed by the native CCL kernel."""
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    labels, areas = get_connected_components(working[None])
    labels, areas = labels[0], areas[0]
    small = (areas > 0) & (areas < area_thresh)
    small_labels = np.unique(labels[small])
    if small_labels.size == 0:
        return mask, False
    fill = np.isin(labels, small_labels)
    if correct_holes:
        return mask | fill, True
    out = mask & ~fill
    if not out.any():  # keep the largest island if everything was removed
        keep = np.argmax(np.where(areas > 0, areas, 0))
        out = labels == labels.reshape(-1)[keep]
    return out, True


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """[..., H, W] -> xyxy boxes; empty masks -> zeros
    (reference amg.py:305-340)."""
    shape = masks.shape
    flat = masks.reshape(-1, *shape[-2:]).astype(bool)
    boxes = np.zeros((flat.shape[0], 4), np.float32)
    for i, m in enumerate(flat):
        ys, xs = np.nonzero(m)
        if ys.size:
            # inclusive max-index edges, matching the reference's
            # coordinate-max formulation (amg.py:305-340)
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return boxes.reshape(*shape[:-2], 4)


def box_xyxy_to_xywh(box: np.ndarray) -> np.ndarray:
    out = np.array(box, np.float32).copy()
    out[..., 2] -= out[..., 0]
    out[..., 3] -= out[..., 1]
    return out


def batch_iterator(batch_size: int, *args) -> Generator:
    n = len(args[0])
    for b in range(0, n, batch_size):
        yield [a[b: b + batch_size] for a in args]


def is_box_near_crop_edge(boxes: np.ndarray, crop_box: List[int],
                          orig_box: List[int], atol: float = 20.0
                          ) -> np.ndarray:
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    boxes = uncrop_boxes_xyxy(np.asarray(boxes, np.float32), crop_box)
    near_crop = np.isclose(boxes, crop[None], atol=atol)
    near_img = np.isclose(boxes, orig[None], atol=atol)
    return (near_crop & ~near_img).any(axis=1)


def nms_boxes(boxes: np.ndarray, scores: np.ndarray,
              iou_threshold: float) -> np.ndarray:
    """Greedy IoU NMS returning kept indices (replaces
    torchvision.ops.batched_nms for a single category)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) \
            * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)
