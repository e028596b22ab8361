"""FAST-tier end-to-end driver epoch (VERDICT r3 weak #7: the quick
feedback loop previously had no whole-pipeline signal — a driver-breaking
change could pass `-m "not slow"` and only surface in the 40-minute full
suite). One bilevel epoch with optimization at the smallest compilable
scale; everything is shrunk to keep the compile under ~1 minute on CPU."""

import dataclasses
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.config import (
    BilevelConfig,
    CameraConfig,
    DetectorConfig,
    NeRFNetConfig,
    NeuralSimConfig,
    RenderConfig,
    SamplerConfig,
)


def test_fast_driver_epoch():
    from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.detector.trainer import init_detector
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params

    cfg = NeuralSimConfig(
        net=NeRFNetConfig(netdepth=1, netwidth=8, netdepth_fine=1,
                          netwidth_fine=8, skips=(), multires=1,
                          multires_views=1),
        render=RenderConfig(n_samples=4, n_importance=4, ray_chunk=1024,
                            near=0.5, far=2.0),
        camera=CameraConfig(height=24, width=24, focal=30.0, fx=30.0,
                            fy=30.0, cx=12.0, cy=12.0),
        sampler=SamplerConfig(n_samples_k=2),
        detector=DetectorConfig(num_classes=2, image_size=32, max_iter=1,
                                images_per_batch=2, warmup_iters=1),
        bilevel=BilevelConfig(n_epochs=1, opt_lr=1e-3, opt_method="sgd",
                              psi_pose_cats_mode="uniform",
                              ihvp_solver="identity", grad_e_max_images=2),
    )
    key = jax.random.PRNGKey(0)
    models = init_nerf_pipeline_params(key, cfg.net, cfg.render.n_importance)
    val_imgs = np.zeros((2, 24, 24, 3), np.float32)
    val_imgs[0, 6:16, 6:16] = 0.9
    val_imgs[1, 10:22, 3:12] = 0.7
    vi, vb, vl, vv = build_detector_batches(val_imgs, [0, 1], cfg.detector)
    val = ValData(vi, vb, vl, vv)

    drv = BilevelDriver(cfg, models, val, key=key, object_class=0,
                        output_dir=tempfile.mkdtemp())
    psi0 = psi_init("uniform")
    popt = psi_optimizer_init("sgd", 1e-3)
    det = init_detector(jax.random.PRNGKey(2), cfg.detector)
    rec = drv.run_epoch(0, psi0, popt, det, save_pngs=False)

    assert rec["grad_psi"].shape == (8,)
    assert np.isfinite(rec["grad_psi"]).all()
    assert np.isfinite(rec["inner_loss"])
    assert np.isfinite(rec["map"]["AP50"]) or np.isnan(rec["map"]["AP50"])
    # psi actually moved (the epoch's [3.4] update applied)
    assert not np.allclose(np.asarray(rec["psi"]), np.asarray(psi0))
