from .distributed import DistributedTrainer, create_global_mesh, initialize_process
from .mesh import (
    create_mesh,
    make_multichip_inference,
    make_multichip_train_step,
    mlp_param_spec,
    shard_pytree,
    vit_param_spec,
)
