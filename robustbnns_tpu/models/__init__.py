from robustbnns_tpu.models.architectures import (
    Architecture,
    build_architecture,
    ACTIVATIONS,
)
from robustbnns_tpu.models.nn import DeterministicNN, train_nn, evaluate_nn
from robustbnns_tpu.models.ensemble import EnsembleNN, train_ensemble
from robustbnns_tpu.models.bnn import BNN

__all__ = [
    "Architecture",
    "build_architecture",
    "ACTIVATIONS",
    "DeterministicNN",
    "train_nn",
    "evaluate_nn",
    "EnsembleNN",
    "train_ensemble",
    "BNN",
]
