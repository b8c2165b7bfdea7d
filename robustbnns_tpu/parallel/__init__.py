from robustbnns_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    sharded_svi_step,
    sharded_predict,
    sharded_attack_grads,
    sharded_hmc_chains,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "sharded_svi_step",
    "sharded_predict",
    "sharded_attack_grads",
    "sharded_hmc_chains",
]
