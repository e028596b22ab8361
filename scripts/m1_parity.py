"""M1 parity in ONE command (SURVEY.md §7 milestone M1, VERDICT r2 #8).

The published ``ycbvid{id}.tar`` NeRF checkpoints are not in this
environment (zero egress), so M1 — "render YCB-V obj-2 from the converted
pretrained checkpoint, matching the PyTorch reference" — cannot execute
yet. This script makes it a single invocation the moment the artifacts
land:

    python scripts/m1_parity.py \
        --tar logs/nerf_models/ycbvid2.tar \
        --info-dir logs/nerfdata [--half_res] [--n-poses 4] \
        [--goldens DIR] [--out /tmp/m1] [--psnr-min 30]

What it does:
  1. converts the torch .tar (data/convert_torch, the exact layout of
     reference run_nerf_noscale.py:295-315) to jax params,
  2. loads H/W/K/near/far with the reference's load_data_param semantics
     (incl. the half_res ÷4 quirk, load_LINEMOD_noscale.py:166-199),
  3. renders a deterministic pose_spherical set with our renderer
     (f32 exact path),
  4. scores PSNR/SSIM against goldens: PNGs in --goldens (named
     ``{i:03d}.png``, rendered by the reference from the pose dump this
     script writes), or — when torch is importable — goldens rendered ON
     THE FLY by importing the reference implementation at
     /root/reference/optimization with the same checkpoint,
  5. prints one JSON line and exits nonzero below --psnr-min.

Self-test (no real checkpoint needed): ``--selftest`` fabricates a
random-init .tar + info.json and runs the full flow, proving every piece
of the M1 path except the weights themselves (also run by
tests/test_m1_parity.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/optimization"


def render_ours(models, cam, poses, n_samples=64, n_importance=128):
    import jax
    import jax.numpy as jnp

    from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
    from neuralsim_tpu.ops.render import render_poses

    net = NeRFNetConfig()
    rc = RenderConfig(
        n_samples=n_samples, n_importance=n_importance,
        ray_chunk=min(20000, cam.height * cam.width),
        near=cam.near, far=cam.far, compute_dtype="float32",
        use_pallas=False,
    ).test_mode()
    models = jax.tree_util.tree_map(jnp.asarray, models)
    out = render_poses(models, jnp.asarray(poses), cam.height, cam.width,
                       cam.K, None, net, rc)
    return np.asarray(out["rgb_map"])


def render_reference(tar_path, cam, poses, n_samples=64, n_importance=128):
    """Golden renders by IMPORTING the reference implementation (oracle
    execution, not a port) with the same checkpoint."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from unittest import mock

    for name in ("cv2", "matplotlib", "matplotlib.pyplot"):
        sys.modules.setdefault(name, mock.MagicMock())
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU execution
    import utils.run_nerf_noscale as noscale

    args = argparse.Namespace(
        multires=10, multires_views=4, i_embed=0, use_viewdirs=True,
        netdepth=8, netwidth=256, netdepth_fine=8, netwidth_fine=256,
        N_importance=n_importance, N_samples=n_samples, netchunk=65536,
        lrate=5e-4, ft_path=tar_path, basedir="/tmp", expname="m1_ref",
        no_reload=False, perturb=0.0, raw_noise_std=0.0, white_bkgd=False,
        lindisp=False, dataset_type="LINEMOD", no_ndc=True,
    )
    os.makedirs("/tmp/m1_ref", exist_ok=True)
    _, render_kwargs_test, *_ = noscale.create_nerf(args)
    render_kwargs_test["near"] = cam.near
    render_kwargs_test["far"] = cam.far
    outs = []
    with torch.no_grad():
        for c2w in poses:
            rgb, _, _, _ = noscale.render(
                cam.height, cam.width, torch.tensor(cam.K),
                chunk=8192, c2w=torch.tensor(np.asarray(c2w, np.float32))[:3, :4],
                **render_kwargs_test)
            outs.append(rgb.cpu().numpy())
    return np.stack(outs)


def ssim(a: np.ndarray, b: np.ndarray, window: int = 7) -> float:
    """Mean windowed SSIM (uniform window, standard constants), numpy-only."""
    def filt(x):
        k = window
        c = np.cumsum(np.cumsum(np.pad(x, ((k, 0), (k, 0), (0, 0))), 0), 1)
        s = c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
        return s[: x.shape[0] - k + 1, : x.shape[1] - k + 1] / (k * k)

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a ** 2
    var_b = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(s.mean())


def make_selftest_artifacts(out_dir: str):
    """Random-init torch .tar + info.json exercising the exact M1 flow."""
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import utils.run_nerf_helpers as helpers

    torch.manual_seed(0)
    mk = lambda: helpers.NeRF(D=8, W=256, input_ch=63, input_ch_views=27,
                              output_ch=5, skips=[4], use_viewdirs=True)
    coarse, fine = mk(), mk()
    tar = os.path.join(out_dir, "ycbvid_selftest.tar")
    opt = torch.optim.Adam(
        list(coarse.parameters()) + list(fine.parameters()), lr=5e-4)
    torch.save({
        "global_step": 0,
        "network_fn_state_dict": coarse.state_dict(),
        "network_fine_state_dict": fine.state_dict(),
        "optimizer_state_dict": opt.state_dict(),
    }, tar)
    info = {
        "H": 400, "W": 400, "near": 0.8104, "far": 1.4298,
        "frames": [{"intrinsic_matrix":
                    [[1333.3334, 0.0, 195.42932],
                     [0.0, 1334.2196, 200.6318], [0.0, 0.0, 1.0]]}],
    }
    with open(os.path.join(out_dir, "nerf_traindata_info.json"), "w") as f:
        json.dump(info, f)
    return tar, out_dir


def main(argv=None):
    # honor JAX_PLATFORMS=cpu even when a sitecustomize latched another
    # platform before this script ran (this environment's axon relay)
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser("m1_parity")
    p.add_argument("--tar", type=str, default=None)
    p.add_argument("--info-dir", type=str, default=None)
    p.add_argument("--half_res", action="store_true", default=True)
    p.add_argument("--full_res", dest="half_res", action="store_false")
    p.add_argument("--n-poses", type=int, default=4)
    p.add_argument("--goldens", type=str, default=None,
                   help="dir of reference-rendered {i:03d}.png goldens")
    p.add_argument("--out", type=str, default="/tmp/m1_parity")
    p.add_argument("--psnr-min", type=float, default=30.0)
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--n-importance", type=int, default=128)
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    if args.selftest:
        args.tar, args.info_dir = make_selftest_artifacts(args.out)
    if not args.tar or not args.info_dir:
        p.error("--tar and --info-dir required (or --selftest)")

    from neuralsim_tpu.data.blender import load_data_param
    from neuralsim_tpu.data.convert_torch import load_nerf_checkpoint
    from neuralsim_tpu.sampler.poses import pose_spherical

    cam = load_data_param(args.info_dir, half_res=args.half_res)
    models, global_step = load_nerf_checkpoint(args.tar)

    import jax.numpy as jnp

    n = args.n_poses
    # deterministic look-at-origin poses spanning the azimuth bins at the
    # sampler's radius/elevation band (theta ~ 90deg -> phi ~ 0; use -5)
    poses = np.asarray(pose_spherical(
        jnp.linspace(0.0, 360.0, n, endpoint=False) + 22.5,
        jnp.full((n,), -5.0), 1.01))
    np.save(os.path.join(args.out, "poses.npy"), poses)

    ours = render_ours(models, cam, poses, args.n_samples, args.n_importance)

    if args.goldens:
        import imageio.v2 as imageio

        golden = np.stack([
            np.asarray(imageio.imread(
                os.path.join(args.goldens, f"{i:03d}.png")), np.float32)
            / 255.0
            for i in range(n)
        ])[..., :3]
    else:
        golden = render_reference(args.tar, cam, poses, args.n_samples,
                                  args.n_importance)

    import imageio.v2 as imageio

    from neuralsim_tpu.ops.render import to8b

    per_image = []
    for i in range(n):
        mse = float(np.mean((ours[i] - golden[i]) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        per_image.append({"psnr": round(psnr, 2),
                          "ssim": round(ssim(ours[i], golden[i]), 4)})
        imageio.imwrite(os.path.join(args.out, f"ours_{i:03d}.png"),
                        to8b(ours[i]))
        imageio.imwrite(os.path.join(args.out, f"golden_{i:03d}.png"),
                        to8b(golden[i]))
    worst = min(x["psnr"] for x in per_image)
    result = {
        "metric": "m1_parity_psnr_worst", "value": worst, "unit": "dB",
        "pass": bool(worst >= args.psnr_min), "per_image": per_image,
        "H": cam.height, "W": cam.width, "out": args.out,
    }
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
