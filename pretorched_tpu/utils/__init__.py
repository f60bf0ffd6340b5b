from .misc import (HTML, cache, chunks, class_accuracy, lazy_property,  # noqa: F401
                   log_add, softmax, sort, topk_accuracy, AverageMeter)
from .size import SizeEstimator  # noqa: F401
