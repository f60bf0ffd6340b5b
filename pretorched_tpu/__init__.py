"""pretorched_tpu — TPU-native (JAX/Flax/Pallas) pretrained model zoo.

A ground-up re-implementation of the capability surface of `pretorched-x`
(reference: /root/reference): the model registry, the pretrained-weights
metadata contract, preprocessing, datasets/metrics, and the example CLI
entry points — designed for TPU (channels-last, jit/pjit, device meshes,
Pallas kernels) rather than translated from PyTorch.

Public contract (parity with reference pretorched/__init__.py:11-83):

    import pretorched_tpu as pretorched
    model = pretorched.__dict__['resnet50'](num_classes=1000, pretrained='imagenet')
    model.eval()
    logits = model(x)            # x: NCHW, like the reference
    f = model.features(x); y = model.logits(f)
    pretorched.model_names, pretorched.pretrained_settings
"""

from .__version__ import __version__  # noqa: F401

# Persistent XLA compilation cache (opt-in via $PRETORCHED_COMPILE_CACHE).
# Must run before any jit compile; a no-op when the env var is unset.
from .utils.compile_cache import enable_from_env as _enable_compile_cache_from_env
_enable_compile_cache_from_env()

from . import models        # noqa: F401  (registers all factories/settings)
from . import transforms    # noqa: F401
from . import datasets      # noqa: F401
from .core.registry import model_names, pretrained_settings, MODEL_REGISTRY  # noqa: F401
from .core.wrapper import PretrainedModel  # noqa: F401
from .models.layers import Identity  # noqa: F401

# Flat factory namespace: pretorched_tpu.__dict__[name](num_classes, pretrained=...)
globals().update(MODEL_REGISTRY)

__all__ = ['__version__', 'models', 'transforms', 'datasets', 'model_names',
           'pretrained_settings', 'PretrainedModel', 'Identity',
           ] + sorted(MODEL_REGISTRY)
