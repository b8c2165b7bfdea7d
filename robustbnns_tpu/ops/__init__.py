from robustbnns_tpu.ops.sampled_dense import (
    sampled_dense,
    sampled_dense_xs,
    sampled_dense_reference,
)
from robustbnns_tpu.ops.fused_predict import (
    svi_predict_fused,
    fused_predictive_fn,
    supports_fused,
)

__all__ = [
    "sampled_dense",
    "sampled_dense_xs",
    "sampled_dense_reference",
    "svi_predict_fused",
    "fused_predictive_fn",
    "supports_fused",
]
