"""utils: phase timers, result logging, debug_nans scope."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.utils.logging import ResultLog, save_args_snapshot
from neuralsim_tpu.utils.profiling import PhaseTimes, debug_nans, phase_timer


def test_phase_timer_accumulates():
    phases = PhaseTimes()
    with phase_timer("render", phases):
        pass
    with phase_timer("render", phases):
        pass
    with phase_timer("train", phases):
        pass
    rep = phases.report()
    assert rep["render"]["count"] == 2
    assert rep["train"]["count"] == 1
    assert rep["render"]["total_s"] >= 0


def test_result_log_formats(tmp_path):
    log = ResultLog(str(tmp_path))
    log.append(0, {"AP": 12.5, "psi": np.arange(3.0)})
    log.append(1, {"AP": 13.0})
    txt = open(tmp_path / "save_result.txt").read()
    # reference format: "epoch: {i}{payload}" lines, append-only
    assert txt.startswith("epoch: 0")
    assert "epoch: 1" in txt
    lines = open(tmp_path / "save_result.jsonl").read().strip().split("\n")
    rec = json.loads(lines[0])
    assert rec["epoch"] == 0 and rec["AP"] == 12.5
    assert rec["psi"] == [0.0, 1.0, 2.0]


def test_reference_exact_line_bytes(tmp_path):
    """The txt lines reproduce the reference's exact byte formats:
    mAP = 'epoch: {i}' + str(result dict of python floats) (:851-853),
    psi = 'epoch: {i}' + str(torch tensor) (:1208-1210)."""
    from neuralsim_tpu.utils.logging import map_result_str, torch_tensor_str

    log = ResultLog(str(tmp_path))
    psi_soft = np.full((8,), 0.125, np.float32)
    log.append(0, {"AP": np.float64(50.25)},
               text=map_result_str({"AP": np.float64(50.25)}))
    log.append(0, {"psi_softmax_T": psi_soft}, text=torch_tensor_str(psi_soft))
    lines = open(tmp_path / "save_result.txt").read().splitlines()
    assert lines[0] == "epoch: 0{'AP': 50.25}"
    import torch

    assert lines[1] == "epoch: 0" + str(torch.from_numpy(psi_soft))
    # emulation fallback agrees with torch for the common fixed-point case
    body = ", ".join(f"{v:.4f}" for v in psi_soft.tolist())
    assert lines[1] == f"epoch: 0tensor([{body}])"


def test_save_args_snapshot(tmp_path):
    from neuralsim_tpu.config import NeuralSimConfig

    save_args_snapshot(str(tmp_path), NeuralSimConfig())
    data = json.loads(open(tmp_path / "args.txt").read())
    assert data["render"]["n_samples"] == 64


def test_debug_nans_scope():
    with debug_nans(False):
        pass  # no-op path
    with debug_nans(True):
        assert jax.config.jax_debug_nans
        with pytest.raises(Exception):
            jnp.log(jnp.array(-1.0)) + 0  # NaN raises inside the scope
    assert not jax.config.jax_debug_nans
