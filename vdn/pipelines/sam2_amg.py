"""Automatic mask generation (reference sam2/automatic_mask_generator.py).

Samples a point grid over the image (plus optional crop layers), predicts
multimask outputs per point through Sam2ImagePredictor, filters by
predicted IoU + stability score, de-duplicates with box NMS, and returns
COCO-style record dicts (RLE segmentation, bbox, area, scores).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from vdn.models.sam2_image import Sam2ImagePredictor
from vdn.ops.amg import (area_from_rle, batch_iterator,
                         batched_mask_to_box, box_xyxy_to_xywh,
                         build_all_layer_point_grids,
                         calculate_stability_score, mask_to_rle, nms_boxes,
                         remove_small_regions, rle_to_mask)


class Sam2AutomaticMaskGenerator:
    def __init__(self, predictor: Sam2ImagePredictor,
                 points_per_side: int = 32,
                 points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.8,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 mask_threshold: float = 0.0,
                 box_nms_thresh: float = 0.7,
                 crop_n_layers: int = 0,
                 crop_n_points_downscale_factor: int = 1,
                 min_mask_region_area: int = 0):
        self.predictor = predictor
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area
        self.point_grids = build_all_layer_point_grids(
            points_per_side, crop_n_layers,
            crop_n_points_downscale_factor)

    def generate(self, image_rgb: np.ndarray) -> List[Dict[str, Any]]:
        h, w = image_rgb.shape[:2]
        self.predictor.set_image(image_rgb)
        points = self.point_grids[0] * np.array([w, h], np.float32)

        all_logits: List[np.ndarray] = []
        all_ious: List[float] = []
        all_points: List[np.ndarray] = []
        for (batch,) in batch_iterator(self.points_per_batch, points):
            # one batched decode per point batch (reference
            # automatic_mask_generator.py _process_batch) — P points
            # share a single broadcast-features dispatch
            logits_b, ious_b, _ = self.predictor.predict_batch(
                point_coords=batch, multimask_output=True,
                return_logits=True)
            for pt, logits, ious in zip(batch, logits_b, ious_b):
                for m, iou in zip(logits, ious):
                    all_logits.append(m)
                    all_ious.append(float(iou))
                    all_points.append(pt)
        if not all_logits:
            return []

        logits = np.stack(all_logits)
        ious = np.asarray(all_ious)
        pts = np.stack(all_points)
        keep = ious > self.pred_iou_thresh
        # stability from the mask LOGITS at threshold +/- offset (reference
        # automatic_mask_generator.py _process_batch)
        stability = calculate_stability_score(
            logits, self.mask_threshold, self.stability_score_offset)
        keep &= stability >= self.stability_score_thresh
        logits, ious, stability, pts = (logits[keep], ious[keep],
                                        stability[keep], pts[keep])
        if logits.size == 0:
            return []
        masks = logits > self.mask_threshold

        boxes = batched_mask_to_box(masks)
        kept = nms_boxes(boxes, ious, self.box_nms_thresh)
        masks, ious, boxes = masks[kept], ious[kept], boxes[kept]
        stability, pts = stability[kept], pts[kept]

        records = []
        for m, iou, box, st, pt in zip(masks, ious, boxes, stability, pts):
            if self.min_mask_region_area > 0:
                m, _ = remove_small_regions(m, self.min_mask_region_area,
                                            "holes")
                m, _ = remove_small_regions(m, self.min_mask_region_area,
                                            "islands")
            rle = mask_to_rle(m)
            records.append({
                "segmentation": rle,
                "area": area_from_rle(rle),
                "bbox": box_xyxy_to_xywh(box).tolist(),
                "predicted_iou": float(iou),
                "point_coords": [pt.tolist()],
                "stability_score": float(st),
            })
        records.sort(key=lambda r: r["area"], reverse=True)
        return records
