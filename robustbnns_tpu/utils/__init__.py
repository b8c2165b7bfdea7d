from robustbnns_tpu.utils.prng import (
    key_from_seed,
    keys_from_seeds,
    make_key,
    use_fast_prng,
)
from robustbnns_tpu.utils.pytree import (
    normal_like_tree,
    tree_size,
    stack_trees,
    index_tree,
    slice_tree,
    flatten_tree_to_vector,
)
from robustbnns_tpu.utils.checkpoint import (
    load_pytree,
    save_pytree,
    wait_for_checkpoints,
)
from robustbnns_tpu.utils.timing import execution_time, Timer

__all__ = [
    "key_from_seed",
    "keys_from_seeds",
    "normal_like_tree",
    "tree_size",
    "stack_trees",
    "index_tree",
    "slice_tree",
    "flatten_tree_to_vector",
    "save_pytree",
    "load_pytree",
    "wait_for_checkpoints",
    "execution_time",
    "Timer",
]
