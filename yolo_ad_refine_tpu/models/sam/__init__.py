"""SAM (Segment Anything) family — TPU-native flax implementation.

Parity surface: reference models/sam/ (build.py, modules/{encoders,
decoders,transformer}.py, model.py, predict.py, amg.py). SAM2's video
memory machinery and the TinyViT mobile variant are not yet built.
"""

from yolo_ad_refine_tpu.models.sam.model import SAM, SAMModel, build_sam  # noqa: F401
