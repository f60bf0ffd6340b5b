from .utils import (Compose, Identity, LoadImage, LoadTransformImage,  # noqa: F401
                    ToRange255, ToSpaceBGR, TransformImage)
