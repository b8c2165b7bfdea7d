from robustbnns_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    sharded_svi_step,
    sharded_predict,
    sharded_attack_grads,
    sharded_hmc_chains,
    sharded_fgsm,
    sharded_pgd,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "sharded_svi_step",
    "sharded_predict",
    "sharded_attack_grads",
    "sharded_hmc_chains",
    "sharded_fgsm",
    "sharded_pgd",
]
