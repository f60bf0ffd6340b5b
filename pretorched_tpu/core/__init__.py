from .registry import (MODEL_REGISTRY, get_factory, image_settings,  # noqa: F401
                       model_names, pretrained_settings, register_model,
                       register_settings)
from .wrapper import PretrainedModel  # noqa: F401
