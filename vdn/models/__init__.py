"""Model assemblies."""

from vdn.models.depth_anything_v2 import (DepthAnythingV2,
                                          build_depth_anything_v2)
from vdn.models.metric_depth import MetricDepthAnythingV2
from vdn.models.presets import MODEL_CONFIGS
from vdn.models.refine import RefineVideoDepth, match_seq_to_first_median
from vdn.models.video_depth_anything import (VideoDepthAnything,
                                             build_video_depth_anything)

__all__ = [
    "DepthAnythingV2", "build_depth_anything_v2",
    "MetricDepthAnythingV2", "MODEL_CONFIGS",
    "RefineVideoDepth", "match_seq_to_first_median",
    "VideoDepthAnything", "build_video_depth_anything",
]
