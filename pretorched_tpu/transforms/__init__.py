from .utils import (Compose, Identity, LoadImage, LoadTransformImage,  # noqa: F401
                    ToRange255, ToSpaceBGR, TransformImage)
from .fused import fused_preprocess, preprocess_clip, ten_crop  # noqa: F401
