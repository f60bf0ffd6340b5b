"""Model subpackage — flat factory namespace (reference: pretorched/models/__init__.py)."""

from .layers import Identity  # noqa: F401

from .resnet import resnet18, resnet34, resnet50, resnet101, resnet152  # noqa: F401
from .alexnet import alexnet  # noqa: F401
from .vgg import (vgg11, vgg11_bn, vgg13, vgg13_bn, vgg16, vgg16_bn,  # noqa: F401
                  vgg19, vgg19_bn)
from .squeezenet import squeezenet1_0, squeezenet1_1  # noqa: F401
from .densenet import densenet121, densenet161, densenet169, densenet201  # noqa: F401
from .inception_v3 import inceptionv3  # noqa: F401

from ..core.registry import MODEL_REGISTRY, model_names, pretrained_settings  # noqa: F401
