"""Data pipeline: datasets, augmentations, loaders.

Parity surface: reference ultralytics/data/ (SURVEY.md §2.5). Host-side
decode + geometric augmentation in numpy/cv2 worker threads; labels are
fixed-size padded tensors (max_boxes) so the device step compiles once —
replacing the reference's variable-length ragged collate (dataset.py:229).
"""

from yolo_ad_refine_tpu.data.dataset import YOLODataset, check_det_dataset  # noqa: F401
from yolo_ad_refine_tpu.data.build import DataLoader, build_dataloader  # noqa: F401
