"""End-to-end bilevel smoke test: tiny NeRF + tiny detector, one full epoch
including the hypergradient chain. This is the integration test the
reference never had (SURVEY.md §4) — a stub-scale version of
bilevel_optimization (neural_sim_main.py:1144-1212)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import (
    BilevelConfig,
    CameraConfig,
    DetectorConfig,
    NeRFNetConfig,
    NeuralSimConfig,
    RenderConfig,
    SamplerConfig,
)
from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
from neuralsim_tpu.detector.dataset import build_detector_batches
from neuralsim_tpu.models.nerf import init_nerf_pipeline_params

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate


def tiny_cfg():
    return NeuralSimConfig(
        net=NeRFNetConfig(netdepth=2, netwidth=16, netdepth_fine=2,
                          netwidth_fine=16, skips=(0,), multires=2,
                          multires_views=1),
        render=RenderConfig(n_samples=4, n_importance=4, ray_chunk=1024,
                            near=0.5, far=2.0),
        camera=CameraConfig(height=32, width=32, focal=40.0, fx=40.0, fy=40.0,
                            cx=16.0, cy=16.0),
        sampler=SamplerConfig(n_samples_k=3),
        detector=DetectorConfig(num_classes=2, image_size=32, max_iter=2,
                                images_per_batch=2, warmup_iters=1),
        bilevel=BilevelConfig(n_epochs=1, opt_lr=1e-3, opt_method="momentum",
                              psi_pose_cats_mode="uniform",
                              ihvp_solver="onestep", grad_e_max_images=2),
    )


@pytest.fixture(scope="module")
def driver():
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    nerf_models = init_nerf_pipeline_params(key, cfg.net, cfg.render.n_importance)

    # tiny val set: 2 synthetic images with objects
    rng = np.random.RandomState(1)
    val_imgs = np.zeros((2, 32, 32, 3), np.float32)
    val_imgs[0, 8:20, 8:20] = 0.9
    val_imgs[1, 12:28, 4:16] = 0.7
    images, boxes, labels, valid = build_detector_batches(
        val_imgs, [0, 1], cfg.detector
    )
    val = ValData(images, boxes, labels, valid)
    import tempfile

    return BilevelDriver(cfg, nerf_models, val, key=key, object_class=0,
                         output_dir=tempfile.mkdtemp())


def test_one_epoch_with_optimization(driver):
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    cfg = driver.cfg
    psi0 = psi_init(cfg.bilevel.psi_pose_cats_mode)
    psi_opt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(2), cfg.detector)

    record = driver.run_epoch(0, psi0, psi_opt, det, save_pngs=False)

    assert np.isfinite(record["inner_loss"])
    assert "AP" in record["map"]
    g = record["grad_psi"]
    assert g.shape == (8,)
    assert np.isfinite(g).all()
    # psi actually moved
    assert not np.allclose(np.asarray(record["psi"]), np.asarray(psi0))
    # probabilities stay a simplex
    np.testing.assert_allclose(record["psi_probs"].sum(), 1.0, rtol=1e-5)


def test_save_renders_withgrad_layout(driver, tmp_path):
    """PNG dump layout matches the reference: forward renders under
    renderonly_path/{object_id}/ and grad-pass debug dumps under
    .../withgrad/ (run_nerf_noscale.py:245-250, 200-206)."""
    import dataclasses as dc

    old_cfg = driver.cfg
    driver.cfg = dc.replace(
        old_cfg, data=dc.replace(old_cfg.data, basedir=str(tmp_path)))
    try:
        renders = jnp.full((2, 8, 8, 3), 0.5)
        driver._save_renders(renders, 0)
        driver._save_renders(renders, 0, subdir="withgrad")
    finally:
        driver.cfg = old_cfg
    base = tmp_path / old_cfg.data.expname / "renderonly_path" / \
        str(old_cfg.data.object_id)
    assert (base / "000.png").exists() and (base / "001.png").exists()
    assert (base / "withgrad" / "000.png").exists()
    assert (base / "withgrad" / "001.png").exists()


def test_epoch_without_optimization(driver):
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    cfg = dataclasses.replace(
        driver.cfg,
        bilevel=dataclasses.replace(driver.cfg.bilevel, optimization=False),
    )
    drv = BilevelDriver(cfg, driver.nerf_models, driver.val_data,
                        key=jax.random.PRNGKey(3), object_class=0,
                        output_dir=driver.output_dir)
    psi0 = psi_init("uniform")
    psi_opt = psi_optimizer_init("sgd", 1e-3)
    det = init_detector(jax.random.PRNGKey(4), cfg.detector)
    record = drv.run_epoch(0, psi0, psi_opt, det, save_pngs=False)
    np.testing.assert_array_equal(np.asarray(record["psi"]), np.asarray(psi0))


def test_detector_warm_start_chains(driver):
    """Epoch 2 must start from epoch 1's detector params (reference
    warm-start via model_final.pth, neural_sim_main.py:840-841)."""
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    psi = psi_init("uniform")
    psi_opt = psi_optimizer_init("sgd", 1e-3)
    det0 = init_detector(jax.random.PRNGKey(5), driver.cfg.detector)
    r1 = driver.run_epoch(0, psi, psi_opt, det0, save_pngs=False)
    det1 = r1["detector_state"]
    assert int(det1.step) == driver.cfg.detector.max_iter
    r2 = driver.run_epoch(1, r1["psi"], r1["psi_opt"], det1, save_pngs=False)
    assert int(r2["detector_state"].step) == 2 * driver.cfg.detector.max_iter


def test_gaussian_psi_epoch(driver):
    """Gaussian-psi bilevel mode end-to-end: (mean, std) hypergradient is
    finite and psi moves (completes the reference's sample-only gaussian
    variant, load_LINEMOD_noscale.py:304-328)."""
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    cfg = dataclasses.replace(
        driver.cfg,
        bilevel=dataclasses.replace(driver.cfg.bilevel, psi_mode="gaussian"),
    )
    drv = BilevelDriver(cfg, driver.nerf_models, driver.val_data,
                        key=jax.random.PRNGKey(9), object_class=0,
                        output_dir=driver.output_dir)
    psi0 = jnp.array([cfg.bilevel.gauss_mean_init,
                      cfg.bilevel.gauss_std_init], jnp.float32)
    psi_opt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr,
                                 dim=2)
    det = init_detector(jax.random.PRNGKey(10), cfg.detector)

    record = drv.run_epoch(0, psi0, psi_opt, det, save_pngs=False)
    g = record["grad_psi"]
    assert g.shape == (2,) and np.isfinite(g).all()
    # NOTE: at this stub scale the hypergradient magnitude can round to
    # zero in f32 (grad_E from a random-init detector is ~1e-7); gradient
    # FLOW for the gaussian mapping is asserted against finite differences
    # in test_sampler.py and against fwd mode in test_render_grad.py
    assert record["psi"].shape == (2,)
    assert "AP" in record["map"]


def test_production_culled_epoch(driver):
    """Driver production mode: occupancy grid built from the coarse model,
    hit budget CALIBRATED (raised from the configured floor to measured
    coverage), and one epoch runs with the culled render."""
    import tempfile

    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    cfg = dataclasses.replace(
        driver.cfg,
        render=dataclasses.replace(driver.cfg.render, hit_budget=0.25,
                                   tighten_bounds=True, n_samples_culled=4),
        # grad_hit_budget < 0: the psi-gradient strips reuse the grid with
        # the CALIBRATED forward budget for ray selection
        bilevel=dataclasses.replace(driver.cfg.bilevel,
                                    grad_hit_budget=-1.0),
    )
    drv = BilevelDriver(cfg, driver.nerf_models, driver.val_data,
                        key=jax.random.PRNGKey(11), object_class=0,
                        output_dir=tempfile.mkdtemp())
    assert drv.grid is not None
    # calibration can only RAISE the configured floor, rounded to 0.05
    b = drv.rc_test.hit_budget
    assert 0.25 <= b <= 1.0 and abs(b / 0.05 - round(b / 0.05)) < 1e-9

    psi0 = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(12), cfg.detector)
    rec = drv.run_epoch(0, psi0, popt, det, save_pngs=False)
    assert np.isfinite(rec["grad_psi"]).all()
    assert np.isfinite(rec["inner_loss"])
    # the gradient pass went through the gather (culled) strip programs
    # (either the selection branch or its full-coverage fallback) — unless
    # calibration raised the budget all the way to 1.0 (nothing to cull)
    if drv.rc_test.hit_budget < 1.0:
        assert any(k[0].startswith("strip_grad_gather")
                   for k in drv._strip_grad_cache), (
            list(drv._strip_grad_cache))


def test_influence_sign_plumbs_to_grad_psi(driver):
    """bc.influence_sign flips grad_psi exactly (the outer loss is linear in
    grad_E): +1.0 reproduces the reference's raw convention, the -1.0
    default is the IFT descent direction (see BilevelConfig)."""
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    psi0 = psi_init("uniform")
    det = init_detector(jax.random.PRNGKey(13), driver.cfg.detector)
    grads = {}
    for sign in (1.0, -1.0):
        cfg = dataclasses.replace(
            driver.cfg,
            bilevel=dataclasses.replace(driver.cfg.bilevel,
                                        influence_sign=sign),
        )
        drv = BilevelDriver(cfg, driver.nerf_models, driver.val_data,
                            key=jax.random.PRNGKey(21), object_class=0,
                            output_dir=driver.output_dir)
        popt = psi_optimizer_init("sgd", 1e-3)
        rec = drv.run_epoch(0, psi0, popt, det, save_pngs=False)
        grads[sign] = np.asarray(rec["grad_psi"])
    scale = np.abs(grads[1.0]).max()
    np.testing.assert_allclose(grads[-1.0], -grads[1.0], rtol=1e-5,
                               atol=1e-7 * max(scale, 1e-20))


def test_occ_budget_guard_recalibrates(driver, caplog):
    """Budget-overflow guard (ADVICE r2): when the rendered epoch's hit
    count exceeds the static cull budget, the driver warns and raises
    hit_budget for subsequent epochs; under-budget epochs are no-ops."""
    import logging

    cfg = dataclasses.replace(
        driver.cfg,
        render=dataclasses.replace(driver.cfg.render, hit_budget=0.25,
                                   tighten_bounds=True, n_samples_culled=4),
    )
    drv = BilevelDriver(cfg, driver.nerf_models, driver.val_data,
                        key=jax.random.PRNGKey(30), object_class=0,
                        output_dir=driver.output_dir)
    calibrated = drv.rc_test.hit_budget

    drv._check_occ_budget(occ_hit=10, occ_budget=100)      # under budget
    assert drv.rc_test.hit_budget == calibrated

    # force a low budget so the raise is observable (calibration on this
    # diffuse random-init scene typically lands at 1.0 already)
    drv.rc_test = dataclasses.replace(drv.rc_test, hit_budget=0.25)
    with caplog.at_level(logging.WARNING):
        raised = drv._check_occ_budget(occ_hit=10 ** 6, occ_budget=100)
    assert raised is True
    assert "budget overflow" in caplog.text
    assert drv.rc_test.hit_budget == 1.0  # huge overflow -> clamped full
    # at 1.0 nothing can overflow -> containment loop terminates
    assert drv._check_occ_budget(occ_hit=10 ** 6, occ_budget=10 ** 6) is False


def test_occ_overflow_epoch_is_contained(driver):
    """VERDICT r3 #6 done-condition: a forced overflow epoch does NOT train
    the detector on degraded renders — run_epoch re-renders the SAME batch
    with the raised budget before the inner train consumes it. With pure
    culling (no tightening) the re-rendered batch is bit-exact vs the
    dense render, so the first-epoch guard PSNR must be ~lossless."""
    import tempfile

    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    cfg = dataclasses.replace(
        driver.cfg,
        render=dataclasses.replace(driver.cfg.render, hit_budget=0.25,
                                   tighten_bounds=False),
    )
    drv = BilevelDriver(cfg, driver.nerf_models, driver.val_data,
                        key=jax.random.PRNGKey(31), object_class=0,
                        output_dir=tempfile.mkdtemp())
    # sabotage the calibrated budget: far below the true hit fraction of
    # the diffuse random-init scene -> the first render MUST overflow
    drv.rc_test = dataclasses.replace(drv.rc_test, hit_budget=0.05)
    drv._build_render_fn()

    calls = []
    orig = drv._do_render

    def spy(psi, noise):
        out = orig(psi, noise)
        calls.append(out)
        return out

    drv._do_render = spy
    psi0 = psi_init("uniform")
    popt = psi_optimizer_init("sgd", 1e-3)
    det = init_detector(jax.random.PRNGKey(32), driver.cfg.detector)
    drv.run_epoch(0, psi0, popt, det, save_pngs=False)

    assert len(calls) >= 2, "overflow did not trigger a re-render"
    assert drv.rc_test.hit_budget > 0.05
    # the renders the detector trained on (last re-render) pass the guard
    assert drv.last_cull_psnr > 40.0, drv.last_cull_psnr


def test_evaluate_jitted_matches_eager_with_tail(driver):
    """The one-program jitted evaluate (VERDICT r2 #5) must equal the eager
    per-batch decode, including a tail batch smaller than images_per_batch
    (3 images at batch 2 -> one padded slot, sliced back off)."""
    import tempfile

    from neuralsim_tpu.detector.trainer import init_detector
    from neuralsim_tpu.models.retinanet import retinanet_inference
    from neuralsim_tpu.detector.evaluator import coco_map, detections_to_eval

    rng = np.random.RandomState(3)
    val_imgs = np.zeros((3, 32, 32, 3), np.float32)
    val_imgs[0, 8:20, 8:20] = 0.9
    val_imgs[1, 12:28, 4:16] = 0.7
    val_imgs[2, 2:10, 20:30] = 0.8
    images, boxes, labels, valid = build_detector_batches(
        val_imgs, [0, 1, 0], driver.cfg.detector)
    val = ValData(images, boxes, labels, valid)
    drv = BilevelDriver(driver.cfg, driver.nerf_models, val,
                        key=jax.random.PRNGKey(40), object_class=0,
                        output_dir=tempfile.mkdtemp())
    det = init_detector(jax.random.PRNGKey(41), driver.cfg.detector)

    got = drv.evaluate(det)

    det_list = []
    for start in range(0, 3, 2):
        dets = retinanet_inference(
            drv.det_apply, det.params, val.images[start:start + 2],
            drv.anchors_per_level, driver.cfg.detector)
        det_list.extend(detections_to_eval(dets))
    want = coco_map(det_list, drv._gt_list)
    for k in ("AP", "AP50", "AP75"):
        if np.isnan(want[k]):
            assert np.isnan(got[k])
        else:
            assert got[k] == pytest.approx(want[k], abs=1e-6)
