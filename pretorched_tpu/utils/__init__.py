from .misc import (HTML, cache, chunks, class_accuracy, lazy_property,  # noqa: F401
                   log_add, softmax, sort, topk_accuracy, AverageMeter,
                   DeviceRunningSums)
from .size import SizeEstimator  # noqa: F401
from .profiling import StepTimer, flops_estimate, op_shapes, trace  # noqa: F401
from .debugging import assert_finite, checked, grad_stats  # noqa: F401
from .bucketing import (BucketedModel, bucket_dim, bucket_frames,  # noqa: F401
                        bucket_spatial, resample_frames_to_bucket,
                        resize_to_bucket)
from .compile_cache import (default_cache_dir, enable_compile_cache,  # noqa: F401
                            enable_from_env)
from .preemption import PreemptionGuard  # noqa: F401
