from .utils import (AveragePrecisionMeter, Warp, download_url,  # noqa: F401
                    load_imagenet_classes)
from .voc import Voc2007Classification, download_voc2007, object_categories  # noqa: F401
from .audio import load_audio, resample, soundnet_input  # noqa: F401
