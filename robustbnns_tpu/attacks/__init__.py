from robustbnns_tpu.attacks.measures import softmax_difference, softmax_robustness
from robustbnns_tpu.attacks.gradient_attacks import (
    fgsm_attack,
    pgd_attack,
    attack,
    attack_evaluation,
    save_attack,
    load_attack,
)

__all__ = [
    "softmax_difference",
    "softmax_robustness",
    "fgsm_attack",
    "pgd_attack",
    "attack",
    "attack_evaluation",
    "save_attack",
    "load_attack",
]
