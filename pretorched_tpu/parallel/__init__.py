from .mesh import (make_mesh, model_shardings, batch_sharding,  # noqa: F401
                   global_batch)
from .dist import initialize  # noqa: F401
from .evaluate import make_eval_step, sharded_accuracy_step  # noqa: F401
from .train import make_train_step  # noqa: F401
from .pipeline import (pipeline_apply, stack_block_params,  # noqa: F401
                       stage_sharding, sequential_apply)
from .moe import (moe_apply, expert_sharding,  # noqa: F401
                  mstrn_expert_apply, mstrn_expert_params,
                  mstrn_expert_spec, trn_expert_forward)
from .zero import (zero_init, tree_axis_shardings,  # noqa: F401
                   sharded_size_bytes)
