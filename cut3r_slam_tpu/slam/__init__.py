from .keyframe import KeyframeStore, SUBMAP_SIZE  # noqa: F401
from .motion_filter import MotionFilter, patch_overlap_ratio  # noqa: F401
from .factor_graph import FactorGraph  # noqa: F401
from .frontend import TrackFrontend  # noqa: F401
