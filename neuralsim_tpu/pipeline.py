"""Pipeline facade: the reference's application-level ``NeRF`` class
(``optimization/neural_sim_main.py:41-191``) re-imagined.

``NeuralSimRenderer`` loads camera intrinsics from
``nerf_traindata_info.json`` (with the pipeline's half_res ÷4 behavior),
loads/initializes the pretrained NeRF pair (torch ``.tar`` converter or
``.npz``), and exposes:

  - ``render_images(psi, key)``  -> (images [K,H,W,3], noise) — the no-grad
    forward sampling+render pass (reference render_images :78-133)
  - ``render_images_grad(psi, noise, grad_E)`` -> dL/dpsi — the reference's
    replayed differentiable render (render_images_grad :134-191), which here
    shares ALL code with the forward pass (same noise pytree in, jax.grad
    around it) instead of a hand-maintained twin path.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.config import NeuralSimConfig
from neuralsim_tpu.data.blender import load_data_param
from neuralsim_tpu.hypergrad.render_grad import (
    render_grad_psi_fwd,
    render_grad_psi_rev,
    render_grad_psi_strips,
)
from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
from neuralsim_tpu.ops.render import render_poses, to8b
from neuralsim_tpu.sampler.poses import (
    PoseNoise,
    draw_pose_noise,
    poses_from_noise,
    psi_to_probs,
)


class NeuralSimRenderer:
    def __init__(self, cfg: NeuralSimConfig, models=None, key=None):
        self.cfg = cfg
        self.rc = cfg.render.test_mode()

        # camera from the pipeline info json when present, else cfg defaults
        info = os.path.join(cfg.data.datadir, "nerf_traindata_info.json")
        if os.path.exists(info):
            cam = load_data_param(cfg.data.datadir, cfg.data.half_res)
            self.H, self.W, self.K = cam.height, cam.width, cam.K
            import dataclasses

            self.rc = dataclasses.replace(self.rc, near=cam.near, far=cam.far)
        else:
            self.H, self.W, self.K = cfg.camera.height, cfg.camera.width, cfg.camera.K

        # render_factor: downsample renders for speed (reference
        # render_path's render_factor, run_nerf_noscale.py:216-221)
        rf = cfg.data.render_factor
        if rf and rf > 0:
            self.H //= rf
            self.W //= rf
            self.K = self.K / rf
            self.K[2, 2] = 1.0

        if models is not None:
            self.models = models
        else:
            self.models = self._load_models(
                key if key is not None else jax.random.PRNGKey(cfg.seed)
            )

        # production empty-space skipping: build the occupancy grid once per
        # scene from the coarse density field (rc.hit_budget < 1.0 opts in),
        # then raise the configured budget to the MEASURED worst-case hit
        # fraction over an all-bins pose sample — a budget below the true
        # fraction silently drops visible rays (see ops.occupancy)
        self.grid = None
        if self.rc.hit_budget < 1.0:
            import dataclasses

            from neuralsim_tpu.ops.occupancy import calibrate_hit_budget
            from neuralsim_tpu.sampler.poses import (
                draw_pose_noise,
                poses_from_noise,
            )

            self.grid = self.occupancy_grid()
            cal_noise = draw_pose_noise(
                jax.random.PRNGKey(cfg.seed), cfg.sampler, num_k=8)
            cal_poses = poses_from_noise(
                jnp.full((8,), 0.125), cal_noise, cfg.sampler)
            budget = calibrate_hit_budget(
                self.grid, cal_poses, self.H, self.W, self.K, self.rc)
            self.rc = dataclasses.replace(
                self.rc, hit_budget=max(self.rc.hit_budget, budget))

        self._render_fn = jax.jit(self._render_impl)

    def occupancy_grid(self, resolution: int = 96, threshold: float = 1e-2,
                       dilate: int = 2, bbox_half: float = None):
        """Conservative occupancy grid from the coarse model's density
        (cached by the constructor when hit_budget < 1.0). By default the
        bbox is DERIVED from the density field over the full reachable
        frustum cube (ops.occupancy.build_scene_grid) — the same path as
        BilevelDriver, so an object outside the old hard-coded
        (-0.4, 0.4)^3 YCB-V cube is never silently culled here either.
        Pass ``bbox_half`` to force a fixed cube instead."""
        from neuralsim_tpu.models.nerf import make_sigma_fn
        from neuralsim_tpu.ops.occupancy import (
            build_occupancy_grid,
            build_scene_grid,
            scene_half_extent,
        )

        sigma_fn = make_sigma_fn(self.models["coarse"], self.cfg.net)
        if bbox_half is None:
            return build_scene_grid(
                sigma_fn,
                scene_half_extent(self.cfg.sampler.radius, self.rc.far,
                                  self.H, self.W, self.K),
                resolution=resolution, threshold=threshold, dilate=dilate,
            )
        return build_occupancy_grid(
            sigma_fn,
            bbox_min=(-bbox_half,) * 3, bbox_max=(bbox_half,) * 3,
            resolution=resolution, threshold=threshold, dilate=dilate,
        )

    def _load_models(self, key):
        cfg = self.cfg
        # reference pins ft_path to logs/nerf_models/ycbvid{id}.tar (:66)
        candidates = []
        if cfg.data.ft_path:
            candidates.append(cfg.data.ft_path)
        candidates.append(os.path.join(
            cfg.data.basedir, "nerf_models", f"ycbvid{cfg.data.object_id}.tar"
        ))
        candidates.append(os.path.join(
            cfg.data.basedir, "nerf_models", f"ycbvid{cfg.data.object_id}.npz"
        ))
        for path in candidates:
            if path and os.path.exists(path):
                if path.endswith(".npz"):
                    from neuralsim_tpu.data.convert_torch import load_params_npz

                    models = load_params_npz(path)
                else:
                    from neuralsim_tpu.data.convert_torch import load_nerf_checkpoint

                    models, _ = load_nerf_checkpoint(path)
                return jax.tree_util.tree_map(jnp.asarray, models)
        # no checkpoint available: random init (tests / from-scratch training)
        return init_nerf_pipeline_params(key, cfg.net, cfg.render.n_importance)

    def _render_impl(self, psi, noise: PoseNoise):
        probs = psi_to_probs(psi, self.cfg.sampler)
        poses = poses_from_noise(probs, noise, self.cfg.sampler)
        out = render_poses(
            self.models, poses, self.H, self.W, self.K, None,
            self.cfg.net, self.rc, grid=self.grid,
        )
        return out["rgb_map"], out["disp_map"], out["acc_map"]

    # ------------------------------------------------------------------ #

    def render_images(self, psi, key, num_k: Optional[int] = None,
                      savedir: Optional[str] = None) -> Tuple[jnp.ndarray, PoseNoise]:
        """Sample K poses from psi and render; optionally dump PNGs under
        ``savedir/{object_id}/{i:03d}.png`` (the reference's on-disk layout,
        run_nerf_noscale.py:245-250)."""
        noise = draw_pose_noise(key, self.cfg.sampler, num_k)
        rgb, _, _ = self._render_fn(psi, noise)
        if savedir:
            out = os.path.join(savedir, str(self.cfg.data.object_id))
            os.makedirs(out, exist_ok=True)
            import imageio.v2 as imageio

            arr = np.asarray(rgb)
            for i in range(arr.shape[0]):
                imageio.imwrite(os.path.join(out, f"{i:03d}.png"), to8b(arr[i]))
        return rgb, noise

    def render_images_grad(self, psi, noise: PoseNoise, grad_E,
                           mode: str = "strips") -> jnp.ndarray:
        """Mean dL/dpsi with grad_E as the rgb cotangent (reference returns
        torch.mean of per-chunk dLdpsi, neural_sim_main.py:191).

        mode: "strips" (default; the v5e-green scan-free host-loop shape,
        see hypergrad.render_grad) | "rev" | "fwd"."""
        n = grad_E.shape[0]
        noise_n = jax.tree_util.tree_map(lambda x: x[:n], noise)
        if mode == "strips":
            if not hasattr(self, "_strip_cache"):
                self._strip_cache = {}
            return render_grad_psi_strips(
                self.models, psi, noise_n, jnp.asarray(grad_E),
                self.H, self.W, self.K, self.cfg.net, self.rc,
                self.cfg.sampler,
                strip=self.cfg.bilevel.grad_ray_chunk,
                jit_cache=self._strip_cache)
        fn = render_grad_psi_rev if mode == "rev" else render_grad_psi_fwd
        return fn(self.models, psi, noise_n, jnp.asarray(grad_E),
                  self.H, self.W, self.K, self.cfg.net, self.rc,
                  self.cfg.sampler)
