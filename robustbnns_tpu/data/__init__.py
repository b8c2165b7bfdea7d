from robustbnns_tpu.data.datasets import (
    load_dataset,
    load_half_moons,
    load_mnist,
    load_fashion_mnist,
    load_cifar,
    labels_to_onehot,
    onehot_to_labels,
)
from robustbnns_tpu.data.loaders import (
    Batches,
    batch_arrays,
    classwise_arrays,
)

__all__ = [
    "load_dataset",
    "load_half_moons",
    "load_mnist",
    "load_fashion_mnist",
    "load_cifar",
    "labels_to_onehot",
    "onehot_to_labels",
    "Batches",
    "batch_arrays",
    "classwise_arrays",
]
