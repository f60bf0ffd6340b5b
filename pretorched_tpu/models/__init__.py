"""Model subpackage — flat factory namespace (reference: pretorched/models/__init__.py)."""

from .layers import Identity  # noqa: F401

from .resnet import resnet18, resnet34, resnet50, resnet101, resnet152  # noqa: F401
from .alexnet import alexnet  # noqa: F401
from .vgg import (vgg11, vgg11_bn, vgg13, vgg13_bn, vgg16, vgg16_bn,  # noqa: F401
                  vgg19, vgg19_bn)
from .squeezenet import squeezenet1_0, squeezenet1_1  # noqa: F401
from .densenet import densenet121, densenet161, densenet169, densenet201  # noqa: F401
from .inception_v3 import inceptionv3  # noqa: F401
from .fbresnet import (fbresnet18, fbresnet34, fbresnet50, fbresnet101,  # noqa: F401
                       fbresnet152)
from .cafferesnet import cafferesnet101  # noqa: F401
from .senet import (se_resnet50, se_resnet101, se_resnet152,  # noqa: F401
                    se_resnext50_32x4d, se_resnext101_32x4d, senet154)
from .resnext import resnext101_32x4d, resnext101_64x4d  # noqa: F401
from .bninception import bninception  # noqa: F401
from .inceptionv4 import inceptionv4  # noqa: F401
from .inceptionresnetv2 import inceptionresnetv2  # noqa: F401
from .xception import xception  # noqa: F401
from .dpn import dpn68, dpn68b, dpn92, dpn98, dpn107, dpn131  # noqa: F401
from .mobilenet import mobilenetv2  # noqa: F401
from .vggm import vggm  # noqa: F401
from .wideresnet import wideresnet50  # noqa: F401
from .resnet3d import (resnet3d10, resnet3d18, resnet3d34, resnet3d50,  # noqa: F401
                       resnet3d101, resnet3d152, resnet3d200, resneti3d50,
                       get_fine_tuning_parameter_names)
from .resnext3d import (resnext3d10, resnext3d18, resnext3d34,  # noqa: F401
                        resnext3d50, resnext3d101, resnext3d152, resnext3d200)
from .wideresnet3d import wideresnet3d50  # noqa: F401
from .preact_resnet3d import (preact_resnet3d10, preact_resnet3d18,  # noqa: F401
                              preact_resnet3d34, preact_resnet3d50,
                              preact_resnet3d101, preact_resnet3d152,
                              preact_resnet3d200)
from .r2plus1d import (r2plus1d10, r2plus1d18, r2plus1d34, r2plus1d50,  # noqa: F401
                       r2plus1d101, r2plus1d152, r2plus1d200)
from . import slowfast  # noqa: F401  (reference exports pretorched.slowfast submodule)
from .slowfast import SlowFastV0  # noqa: F401
from .densenet3d import (densenet3d121, densenet3d169, densenet3d201,  # noqa: F401
                         densenet3d264)
from .multiview import mvresnet10, mvresnet18, mvresnet34, mvresnet50  # noqa: F401
from .soundnet import BranchedSoundNet, soundnet8  # noqa: F401
from .nasnet import nasnetalarge, nasnetamobile  # noqa: F401
from .pnasnet import pnasnet5large  # noqa: F401
from .polynet import polynet  # noqa: F401
from .trn import trn  # noqa: F401
from .nonlocalnet import (MNISTNonLocalNet, NonLocalBlock, NonLocalBlock1D,  # noqa: F401
                          NonLocalBlock2D, NonLocalBlock3D,
                          nonlocalresnet3d18, nonlocalresnet3d34,
                          nonlocalresnet3d50, nonlocalresnet3d101,
                          nonlocalresnet3d152)

from ..core.registry import MODEL_REGISTRY, model_names, pretrained_settings  # noqa: F401
