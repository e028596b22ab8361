from neuralsim_tpu.sampler.gumbel import (
    gumbel_noise,
    gumbel_softmax_expectation,
)
from neuralsim_tpu.sampler.poses import (
    PoseNoise,
    draw_pose_noise,
    pose_spherical,
    poses_from_noise,
    sample_poses,
    sample_poses_gaussian,
    psi_to_probs,
)

__all__ = [
    "gumbel_noise",
    "gumbel_softmax_expectation",
    "PoseNoise",
    "draw_pose_noise",
    "pose_spherical",
    "poses_from_noise",
    "sample_poses",
    "sample_poses_gaussian",
    "psi_to_probs",
]
