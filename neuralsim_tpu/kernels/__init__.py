from neuralsim_tpu.kernels.raymarch import fused_nerf_mlp, pallas_available

__all__ = ["fused_nerf_mlp", "pallas_available"]
