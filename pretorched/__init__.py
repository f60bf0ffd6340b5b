"""Drop-in alias: ``import pretorched`` == ``import pretorched_tpu``.

Lets reference users keep their import lines
(``pretorched.__dict__['resnet3d50'](...)``) unchanged.
"""

import sys as _sys

import pretorched_tpu as _impl
from pretorched_tpu import *  # noqa: F401,F403
from pretorched_tpu import (MODEL_REGISTRY, PretrainedModel, Identity,  # noqa: F401
                            model_names, pretrained_settings, __version__)
from pretorched_tpu import datasets, models, transforms  # noqa: F401
from pretorched_tpu.models import slowfast  # noqa: F401

globals().update(MODEL_REGISTRY)

_sys.modules[__name__ + '.models'] = models
_sys.modules[__name__ + '.datasets'] = datasets
_sys.modules[__name__ + '.transforms'] = transforms
