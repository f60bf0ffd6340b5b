"""Model subpackage — flat factory namespace (reference: pretorched/models/__init__.py)."""

from .layers import Identity  # noqa: F401

from .resnet import resnet18, resnet34, resnet50, resnet101, resnet152  # noqa: F401

from ..core.registry import MODEL_REGISTRY, model_names, pretrained_settings  # noqa: F401
