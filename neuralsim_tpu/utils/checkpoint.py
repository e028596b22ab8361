"""Unified checkpoint/resume subsystem.

The reference checkpoints only the NeRF (.tar every i_weights iters,
run_nerf_noscale.py:723-731) and the detector (model_final.pth chaining
outer iterations, neural_sim_main.py:841); psi itself is never checkpointed
— a crashed outer loop restarts from scratch (SURVEY.md §5). Here ONE
orbax checkpoint captures the full bilevel state: NeRF params, detector
params + optimizer state, psi + psi-optimizer state, PRNG key, and the outer
epoch — so resume is exact.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_pure_pytree(tree):
    """NamedTuples/custom nodes -> nested dicts/lists of arrays for orbax."""
    if hasattr(tree, "_asdict"):
        return {k: _to_pure_pytree(v) for k, v in tree._asdict().items()}
    if isinstance(tree, dict):
        return {k: _to_pure_pytree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_pure_pytree(v) for v in tree]
    return tree


class CheckpointManager:
    """Thin orbax wrapper with a numpy .npz fallback (orbax is baked into
    the image, but the fallback keeps tests hermetic and fast)."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 use_orbax: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._mgr = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._mgr = ocp.CheckpointManager(
                    self.directory,
                    options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
                )
            except Exception:
                self._mgr = None

    # ------------------------------------------------------------------ #

    def save(self, step: int, state: Dict[str, Any]):
        state = _to_pure_pytree(state)
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
            return
        flat, treedef = jax.tree_util.tree_flatten(state)
        np.savez(
            os.path.join(self.directory, f"ckpt_{step:08d}.npz"),
            __treedef__=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        )
        self._prune_npz()

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = self._npz_steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None,
                like: Optional[Dict[str, Any]] = None) -> Optional[Dict[str, Any]]:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            if like is not None:
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(_to_pure_pytree(like))
                )
            return self._mgr.restore(step)
        data = np.load(os.path.join(self.directory, f"ckpt_{step:08d}.npz"))
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
        if like is None:
            raise ValueError("npz restore requires a `like` pytree")
        treedef = jax.tree_util.tree_structure(_to_pure_pytree(like))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # ------------------------------------------------------------------ #

    def _npz_steps(self):
        return sorted(
            int(f[5:-4]) for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        )

    def _prune_npz(self):
        steps = self._npz_steps()
        for s in steps[: -self.max_to_keep]:
            os.remove(os.path.join(self.directory, f"ckpt_{s:08d}.npz"))


def save_nerf_tar_compatible(path: str, models: Dict, global_step: int = 0):
    """Write a torch-layout ``.tar`` checkpoint from our params so renders
    can round-trip back into the reference tooling (inverse of
    data.convert_torch)."""
    import torch

    def to_sd(params):
        sd = {}
        groups: Dict[str, Dict[str, np.ndarray]] = {}
        for key, val in params.items():
            name, kind = key.rsplit("_", 1)
            groups.setdefault(name, {})[kind] = np.asarray(val)
        name_map = {
            "feature": "feature_linear", "alpha": "alpha_linear",
            "views_0": "views_linears.0", "rgb": "rgb_linear",
            "output": "output_linear",
        }
        for name, kv in groups.items():
            if name.startswith("pts_"):
                torch_name = f"pts_linears.{name[4:]}"
            else:
                torch_name = name_map[name]
            sd[f"{torch_name}.weight"] = torch.from_numpy(kv["kernel"].T.copy())
            sd[f"{torch_name}.bias"] = torch.from_numpy(kv["bias"].copy())
        return sd

    ckpt = {
        "global_step": global_step,
        "network_fn_state_dict": to_sd(models["coarse"]),
    }
    if "fine" in models:
        ckpt["network_fine_state_dict"] = to_sd(models["fine"])
    torch.save(ckpt, path)
