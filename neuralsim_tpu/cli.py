"""Command-line entry point — reference-compatible surface.

``python -m neuralsim_tpu.cli --config configs/nerf_param_ycbv_general.txt
--expname ycbv2_01 --object_id 2 --psi_pose_cats_mode 5 --test_distribution
one_1`` mirrors the reference invocation (``README.md:104-117`` /
``optimization/neural_sim_main.py:1363-1383``): build the renderer, the
detector, and run the bilevel optimization.
"""

from __future__ import annotations

import os


import jax
import numpy as np


def main(argv=None, cfg=None):
    from neuralsim_tpu.config import parse_cli
    from neuralsim_tpu.pipeline import NeuralSimRenderer
    from neuralsim_tpu.utils.logging import save_args_snapshot

    cfg = cfg if cfg is not None else parse_cli(argv)
    key = jax.random.PRNGKey(cfg.seed)

    expdir = os.path.join(cfg.data.basedir, cfg.data.expname)
    os.makedirs(expdir, exist_ok=True)
    save_args_snapshot(expdir, cfg)

    renderer = NeuralSimRenderer(cfg, key=key)

    val_data, object_class, bg_images, bg_labels = _load_detector_data(cfg)

    from neuralsim_tpu.bilevel.driver import BilevelDriver

    driver = BilevelDriver(
        cfg, renderer.models, val_data, key=key, object_class=object_class,
        background_images=bg_images, background_labels=bg_labels,
    )
    result = driver.run()
    print("final psi:", np.asarray(result["psi"]))
    return result


def _load_detector_data(cfg):
    """Load the val distribution + background-class train images from the
    reference directory layout (configs/ycb_synthetic_train_val_path_info.json)
    when present; otherwise build a minimal single-class setup."""
    import json

    import jax.numpy as jnp

    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.bilevel.driver import ValData

    path_info = cfg.data.train_val_path_info
    dc = cfg.detector
    if os.path.exists(path_info):
        with open(path_info) as f:
            info = json.load(f)
        class_names = sorted(info["train_info"].keys(), key=lambda s: (len(s), s))
        class_to_idx = {c: i for i, c in enumerate(class_names)}
        object_class = class_to_idx[cfg.data.object_id]

        test_dirs = info["test_info"][cfg.data.test_distribution]
        val_imgs, val_labels = _read_class_dirs(test_dirs, class_to_idx, cfg.data.basedir)
        bg_dirs = {
            c: d for c, d in info["train_info"].items() if c != cfg.data.object_id
        }
        bg_imgs, bg_labels = _read_class_dirs(bg_dirs, class_to_idx, cfg.data.basedir)
    else:
        object_class = 0
        val_imgs, val_labels = np.zeros((0, 8, 8, 3), np.float32), []
        bg_imgs, bg_labels = None, None

    if len(val_imgs):
        images, boxes, labels, valid = build_detector_batches(val_imgs, val_labels, dc)
        val = ValData(images, boxes, labels, valid)
    else:
        s = dc.image_size
        val = ValData(jnp.zeros((1, s, s, 3)), jnp.zeros((1, 1, 4)),
                      jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), bool))
    if bg_imgs is not None and len(bg_imgs) == 0:
        bg_imgs, bg_labels = None, None
    return val, object_class, bg_imgs, bg_labels


def _read_class_dirs(dirs, class_to_idx, basedir):
    import imageio.v2 as imageio

    images, labels = [], []
    for cname, d in dirs.items():
        full = d if os.path.isabs(d) else os.path.join(basedir, d)
        if not os.path.isdir(full):
            continue
        for f in sorted(os.listdir(full)):
            if f.endswith(".png"):
                img = np.asarray(imageio.imread(os.path.join(full, f)), np.float32) / 255.0
                images.append(img[..., :3])
                labels.append(class_to_idx[cname])
    if not images:
        return np.zeros((0, 8, 8, 3), np.float32), []
    return np.stack(images), labels


if __name__ == "__main__":
    main()
