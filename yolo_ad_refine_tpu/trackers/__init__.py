"""Multi-object trackers (parity: reference ultralytics/trackers/).

BYTETracker (byte_tracker.py:235): Kalman-filtered two-stage IoU association.
BOTSORT (bot_sort.py): BYTE + sparse-optical-flow camera-motion compensation.
Host-side numpy/scipy — tracking operates on NMS outputs, not device tensors.
"""

from yolo_ad_refine_tpu.trackers.byte_tracker import BYTETracker, STrack  # noqa: F401
from yolo_ad_refine_tpu.trackers.bot_sort import BOTSORT  # noqa: F401

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}
