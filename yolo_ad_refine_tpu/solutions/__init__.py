"""Solution apps over detection/tracking results.

Parity surface: reference ultralytics/solutions/ (object_counter, heatmap,
speed_estimation, distance_calculation, queue_management, ...). The core
trio is implemented; each consumes per-frame Results (with track ids) and
maintains host-side state.
"""

from yolo_ad_refine_tpu.solutions.object_counter import ObjectCounter  # noqa: F401
from yolo_ad_refine_tpu.solutions.heatmap import Heatmap  # noqa: F401
from yolo_ad_refine_tpu.solutions.speed_estimator import SpeedEstimator  # noqa: F401
from yolo_ad_refine_tpu.solutions.queue_manager import QueueManager  # noqa: F401
from yolo_ad_refine_tpu.solutions.distance_calculator import DistanceCalculator  # noqa: F401
