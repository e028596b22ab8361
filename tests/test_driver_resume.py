"""Bilevel checkpoint/resume: run 2 epochs, crash-restart, continue at 3."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate


def test_run_with_checkpoint_resume(tmp_path):
    from tests.test_bilevel_e2e import tiny_cfg
    from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, bilevel=dataclasses.replace(cfg.bilevel, optimization=True)
    )
    key = jax.random.PRNGKey(0)
    nerf = init_nerf_pipeline_params(key, cfg.net, cfg.render.n_importance)
    val_imgs = np.zeros((1, 32, 32, 3), np.float32)
    val_imgs[0, 8:20, 8:20] = 0.9
    images, boxes, labels, valid = build_detector_batches(val_imgs, [0], cfg.detector)
    val = ValData(images, boxes, labels, valid)

    ckdir = str(tmp_path / "ck")
    drv = BilevelDriver(cfg, nerf, val, key=key, object_class=0,
                        output_dir=str(tmp_path / "out"))
    r1 = drv.run(n_epochs=2, save_pngs=False, checkpoint_dir=ckdir)
    assert len(r1["history"]) == 2

    # "crash": new driver, resume from checkpoints, run to epoch 3
    drv2 = BilevelDriver(cfg, nerf, val, key=jax.random.PRNGKey(99),
                         object_class=0, output_dir=str(tmp_path / "out2"))
    r2 = drv2.run(n_epochs=3, save_pngs=False, checkpoint_dir=ckdir)
    # only epoch 2 runs (0 and 1 restored)
    assert [h["epoch"] for h in r2["history"]] == [2]
    # detector step count carried across the resume
    assert int(r2["detector_state"].step) == 3 * cfg.detector.max_iter


def test_resume_restores_optimizer_momentum(tmp_path):
    """The resumed inner-optimizer state must equal the checkpointed one —
    SGD momentum buffers and the warmup counter do not reset (ADVICE r1)."""
    from tests.test_bilevel_e2e import tiny_cfg
    from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, bilevel=dataclasses.replace(cfg.bilevel, optimization=False)
    )
    key = jax.random.PRNGKey(0)
    nerf = init_nerf_pipeline_params(key, cfg.net, cfg.render.n_importance)
    val_imgs = np.zeros((1, 32, 32, 3), np.float32)
    val_imgs[0, 8:20, 8:20] = 0.9
    images, boxes, labels, valid = build_detector_batches(val_imgs, [0], cfg.detector)
    val = ValData(images, boxes, labels, valid)

    ckdir = str(tmp_path / "ck")
    drv = BilevelDriver(cfg, nerf, val, key=key, object_class=0,
                        output_dir=str(tmp_path / "out"))
    r1 = drv.run(n_epochs=1, save_pngs=False, checkpoint_dir=ckdir)
    want = jax.tree_util.tree_leaves(r1["detector_state"].opt_state)
    assert any(np.any(np.asarray(l) != 0) for l in want), "momentum is live"

    # a resumed run that executes NO new epochs must hand back the exact state
    drv2 = BilevelDriver(cfg, nerf, val, key=jax.random.PRNGKey(7),
                         object_class=0, output_dir=str(tmp_path / "out2"))
    r2 = drv2.run(n_epochs=1, save_pngs=False, checkpoint_dir=ckdir)
    got = jax.tree_util.tree_leaves(r2["detector_state"].opt_state)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
