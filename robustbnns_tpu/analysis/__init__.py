from robustbnns_tpu.analysis.gradients import (
    expected_loss_gradients,
    loss_gradients,
    save_loss_gradients,
    load_loss_gradients,
    compute_vanishing_norms_idxs,
)

__all__ = [
    "expected_loss_gradients",
    "loss_gradients",
    "save_loss_gradients",
    "load_loss_gradients",
    "compute_vanishing_norms_idxs",
]
