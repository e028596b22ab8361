from neuralsim_tpu.bilevel.psi_init import psi_init
from neuralsim_tpu.bilevel.psi_opt import (
    PsiOptState,
    adjust_learning_rate,
    psi_optimizer_init,
    psi_optimizer_update,
)

__all__ = [
    "psi_init",
    "PsiOptState",
    "adjust_learning_rate",
    "psi_optimizer_init",
    "psi_optimizer_update",
]
