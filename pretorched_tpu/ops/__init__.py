from .pooling import (adaptive_avg_pool, adaptive_avg_pool2d,  # noqa: F401
                      adaptive_avg_pool3d, adaptive_avgmax_pool2d,
                      adaptive_max_pool, adaptive_max_pool2d, avg_pool,
                      avg_pool2d, avg_pool3d, global_avg_pool, max_pool,
                      max_pool2d, max_pool3d)
