from robustbnns_tpu.inference.svi import (
    MeanFieldPosterior,
    init_meanfield,
    sample_meanfield,
    gaussian_kl_to_std_normal,
    elbo_loss,
    svi_train,
)
from robustbnns_tpu.inference.hmc import (
    HMCConfig,
    hmc_sample,
    hmc_train_batched,
)
from robustbnns_tpu.inference.nuts import (
    NUTSConfig,
    nuts_sample,
)

__all__ = [
    "MeanFieldPosterior",
    "init_meanfield",
    "sample_meanfield",
    "gaussian_kl_to_std_normal",
    "elbo_loss",
    "svi_train",
    "HMCConfig",
    "hmc_sample",
    "hmc_train_batched",
    "NUTSConfig",
    "nuts_sample",
]
