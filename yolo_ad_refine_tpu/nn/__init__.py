"""NN module library (flax.linen, NHWC, bf16-compute friendly).

Parity surface: reference ultralytics/nn/modules/{conv,block,head,mona}.py.
Modules are registered by name for the yaml model compiler in
``yolo_ad_refine_tpu.models.parser``.
"""

from yolo_ad_refine_tpu.nn import block, common, head  # noqa: F401
from yolo_ad_refine_tpu.nn.registry import MODULE_REGISTRY, register  # noqa: F401
