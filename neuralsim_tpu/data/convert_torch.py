"""PyTorch ``.tar`` NeRF checkpoint -> neuralsim_tpu params converter.

The published pretrained models (``logs/nerf_models/ycbvid{id}.tar``,
reference ``optimization/neural_sim_main.py:66``) are torch ``state_dict``
archives with layout (reference ``run_nerf_noscale.py:295-315`` and the MLP
definition in ``run_nerf_helpers.py:82-97``)::

    {global_step, optimizer_state_dict,
     network_fn_state_dict:  {pts_linears.{i}.weight [out,in], .bias [out],
                              feature_linear.*, alpha_linear.*,
                              views_linears.0.*, rgb_linear.*},
     network_fine_state_dict: same}

torch Linear stores weight as [out, in]; our kernels are [in, out] so each
weight transposes on conversion.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


_NAME_MAP = [
    ("feature_linear", "feature"),
    ("alpha_linear", "alpha"),
    ("views_linears.0", "views_0"),
    ("rgb_linear", "rgb"),
    ("output_linear", "output"),
]


def _convert_state_dict(sd: Dict) -> Dict[str, np.ndarray]:
    params: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val,
                         dtype=np.float32)
        if key.startswith("pts_linears."):
            _, idx, kind = key.split(".")
            name = f"pts_{idx}"
        else:
            name = None
            for torch_name, ours in _NAME_MAP:
                if key.startswith(torch_name):
                    name, kind = ours, key.rsplit(".", 1)[1]
                    break
            if name is None:
                raise KeyError(f"unrecognized checkpoint key: {key}")
        if kind == "weight":
            params[f"{name}_kernel"] = arr.T.copy()
        elif kind == "bias":
            params[f"{name}_bias"] = arr
        else:
            raise KeyError(f"unrecognized parameter kind in key: {key}")
    return params


def convert_torch_checkpoint(ckpt: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    """Convert a loaded torch checkpoint dict to {'coarse': ..., 'fine': ...}."""
    models = {"coarse": _convert_state_dict(ckpt["network_fn_state_dict"])}
    fine = ckpt.get("network_fine_state_dict")
    if fine is not None:
        models["fine"] = _convert_state_dict(fine)
    return models


def load_nerf_checkpoint(path: str):
    """Load a reference ``.tar`` checkpoint from disk (torch-cpu required
    only here, at the import boundary — never in the compute path)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    models = convert_torch_checkpoint(ckpt)
    return models, int(ckpt.get("global_step", 0))


def save_params_npz(path: str, models: Dict[str, Dict[str, np.ndarray]]):
    """Persist converted params as a flat npz (torch-free reload)."""
    flat = {}
    for model_name, params in models.items():
        for k, v in params.items():
            flat[f"{model_name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    flat = np.load(path)
    models: Dict[str, Dict[str, np.ndarray]] = {}
    for key in flat.files:
        model_name, pname = key.split("/", 1)
        models.setdefault(model_name, {})[pname] = flat[key]
    return models
