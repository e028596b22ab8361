from neuralsim_tpu.hypergrad.render_grad import (
    psi_outer_loss,
    render_grad_psi_fwd,
    render_grad_psi_rev,
)
from neuralsim_tpu.hypergrad.influence import (
    flat_dot,
    grad_loss,
    hvp,
    inverse_hvp,
    mixed_grad_wrt_images,
)

__all__ = [
    "psi_outer_loss",
    "render_grad_psi_fwd",
    "render_grad_psi_rev",
    "flat_dot",
    "grad_loss",
    "hvp",
    "inverse_hvp",
    "mixed_grad_wrt_images",
]
