"""Unrolled hypergradient: finite-difference EXACTNESS.

The influence approximation (reference neural_sim_main.py:912-1069) cannot
be FD-tested — it is biased whenever the inner loop hasn't converged. The
unrolled mode differentiates through the actual training trajectory, so
its gradient must match finite differences of
val_loss(inner_train(batches(images))) to numerical precision.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.detector.dataset import build_detector_batches_device
from neuralsim_tpu.detector.trainer import (
    cycle_batches,
    init_detector,
    inner_train,
    make_detector_apply,
)
from neuralsim_tpu.hypergrad.unrolled import unrolled_grad_images, val_loss_sum
from neuralsim_tpu.models.retinanet import generate_anchors

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate

# base_lr above the reference's 2.5e-4 but below instability: at 3 tiny
# steps the val loss must depend MEASURABLY on the train images (at the
# reference LR the derivative ~7e-4 drowns in ~5e-4 f32 FD noise; at 0.05
# the trajectory turns chaotic and fwd/rev accumulation diverges ~1%)
DC = DetectorConfig(num_classes=2, image_size=32, max_iter=3,
                    images_per_batch=2, warmup_iters=1, base_lr=5e-3)


@pytest.fixture(scope="module")
def setup():
    anchors_cat = jnp.concatenate(generate_anchors(DC.image_size), axis=0)
    _, det_apply = make_detector_apply(DC)
    det0 = init_detector(jax.random.PRNGKey(0), DC)

    # train images: TEXTURED objects on EXACT-zero background. Textured,
    # not constant: constant patches make whole banks of relu
    # pre-activations tie exactly at their kinks, where the (one-sided)
    # gradient and the (two-sided) finite difference legitimately disagree
    # — measured as a stable 2.2x FD mismatch in f64 before randomizing.
    # Zero background keeps the annotation threshold uncrossable.
    prng = np.random.RandomState(42)
    imgs = np.zeros((3, 32, 32, 3), np.float32)
    imgs[0, 6:20, 6:20] = 0.3 + 0.5 * prng.rand(14, 14, 3)
    imgs[1, 10:26, 4:18] = 0.2 + 0.5 * prng.rand(16, 14, 3)
    imgs[2, 2:12, 14:30] = 0.3 + 0.4 * prng.rand(10, 16, 3)
    labels = jnp.array([0, 1, 0], jnp.int32)

    # val set: fixed synthetic batch
    from neuralsim_tpu.bilevel.driver import ValData
    from neuralsim_tpu.detector.dataset import build_detector_batches

    val_imgs = np.zeros((2, 32, 32, 3), np.float32)
    val_imgs[0, 8:20, 8:20] = 0.9
    val_imgs[1, 12:28, 4:16] = 0.7
    vi, vb, vl, vv = build_detector_batches(val_imgs, [0, 1], DC)
    val = ValData(vi, vb, vl, vv)

    key = jax.random.PRNGKey(3)
    return det_apply, det0, jnp.asarray(imgs), labels, val, anchors_cat, key


def _loss_of_images(det_apply, det0, labels, val, anchors_cat, key):
    def f(imgs):
        inputs, gb, gl, gv = build_detector_batches_device(imgs, labels, DC)
        batches = cycle_batches(inputs, gb, gl, gv, DC.max_iter,
                                DC.images_per_batch, key)
        final, _ = inner_train(det0, batches, DC, anchors_cat, remat=True)
        return val_loss_sum(det_apply, final.params, val, DC, anchors_cat)
    return f


def test_unrolled_matches_finite_differences(setup):
    det_apply, det0, imgs, labels, val, anchors_cat, key = setup
    g = np.asarray(unrolled_grad_images(
        det_apply, det0, imgs, labels, val, DC, anchors_cat, key))
    assert g.shape == imgs.shape and np.isfinite(g).all()
    assert np.abs(g).max() > 0.0

    f = jax.jit(_loss_of_images(det_apply, det0, labels, val, anchors_cat,
                                key))
    # direction supported strictly INSIDE the objects: no annotation-
    # threshold crossing under +/- eps
    rng = np.random.RandomState(7)
    d = np.zeros_like(np.asarray(imgs))
    d[0, 8:18, 8:18] = rng.randn(10, 10, 3)
    d[1, 12:24, 6:16] = rng.randn(12, 10, 3)
    d = jnp.asarray(d / np.linalg.norm(d))

    # exact forward-mode directional derivative: must equal the reverse-
    # mode gradient to f32 roundoff. This is the rigorous check: jvp and
    # vjp are algorithmically independent linearizations of the same
    # program (x64 FD is unavailable — the detector's flax modules pin
    # f32 activations, quantizing the loss to f32 regardless of input
    # precision; measured).
    _, jvp_val = jax.jvp(f, (imgs,), (d,))
    analytic = float(jnp.sum(jnp.asarray(g) * d))
    np.testing.assert_allclose(analytic, float(jvp_val), rtol=5e-3,
                               atol=1e-7)

    # finite differences: only a narrow step window is valid in f32 —
    # below ~1e-4 the f32 loss quantization (~2.4e-7 * |f| / eps)
    # dominates; above ~1e-3 the high-frequency structure a 3-step SGD
    # trajectory imprints on the loss landscape does (measured sweep:
    # eps 3e-4 -> ratio 1.14, eps 1e-3 -> ratio -918). Loose tolerance,
    # sanity-level only; the jvp check above carries the precision.
    eps = 3e-4
    fd = (float(f(imgs + eps * d)) - float(f(imgs - eps * d))) / (2 * eps)
    np.testing.assert_allclose(analytic, fd, rtol=0.4, atol=1e-4)


def test_unrolled_remat_equals_no_remat(setup):
    """remat changes memory, not values."""
    det_apply, det0, imgs, labels, val, anchors_cat, key = setup
    inputs, gb, gl, gv = build_detector_batches_device(imgs, labels, DC)
    batches = cycle_batches(inputs, gb, gl, gv, DC.max_iter,
                            DC.images_per_batch, key)
    f_r, _ = inner_train(det0, batches, DC, anchors_cat, remat=True)
    f_n, _ = inner_train(det0, batches, DC, anchors_cat, remat=False)
    for a, b in zip(jax.tree_util.tree_leaves(f_r.params),
                    jax.tree_util.tree_leaves(f_n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_driver_unrolled_epoch(setup):
    """Driver end-to-end with hypergrad_mode='unrolled': epoch runs, psi
    gradient finite."""
    import sys
    import tempfile

    sys.path.insert(0, "tests")
    from test_bilevel_e2e import tiny_cfg

    from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, bilevel=dataclasses.replace(cfg.bilevel,
                                         hypergrad_mode="unrolled"))
    key = jax.random.PRNGKey(0)
    models = init_nerf_pipeline_params(key, cfg.net, cfg.render.n_importance)
    val_imgs = np.zeros((2, 32, 32, 3), np.float32)
    val_imgs[0, 8:20, 8:20] = 0.9
    val_imgs[1, 12:28, 4:16] = 0.7
    vi, vb, vl, vv = build_detector_batches(val_imgs, [0, 1], cfg.detector)
    val = ValData(vi, vb, vl, vv)
    drv = BilevelDriver(cfg, models, val, key=key, object_class=0,
                        output_dir=tempfile.mkdtemp())
    psi0 = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(2), cfg.detector)
    rec = drv.run_epoch(0, psi0, popt, det, save_pngs=False)
    assert np.isfinite(rec["grad_psi"]).all()
    assert rec["grad_psi"].shape == (8,)


def test_unrolled_with_backgrounds_fd(setup):
    """VERDICT r3 #8: backgrounds enter the recomputed schedule as constant
    entries (zero image-cotangent, renders-first order). The returned
    gradient must equal the jvp of the mixed-dataset loss."""
    det_apply, det0, imgs, labels, val, anchors_cat, key = setup
    prng = np.random.RandomState(11)
    bg = np.clip(0.3 + 0.2 * prng.randn(2, 32, 32, 3), 0.05, 1.0
                 ).astype(np.float32)
    bg_labels = [1, 0]

    g = np.asarray(unrolled_grad_images(
        det_apply, det0, imgs, labels, val, DC, anchors_cat, key,
        background_images=bg, background_labels=bg_labels))
    assert g.shape == imgs.shape and np.isfinite(g).all()
    assert np.abs(g).max() > 0.0

    # independent mixed-dataset loss (renders differentiable, bg constant)
    bg_batches = build_detector_batches_device(jnp.asarray(bg), bg_labels,
                                               DC, largest_only=True)

    def f(ims):
        parts = build_detector_batches_device(ims, labels, DC,
                                              largest_only=True)
        inputs, gb, gl, gv = (jnp.concatenate([a, b], 0)
                              for a, b in zip(parts, bg_batches))
        batches = cycle_batches(inputs, gb, gl, gv, DC.max_iter,
                                DC.images_per_batch, key)
        final, _ = inner_train(det0, batches, DC, anchors_cat, remat=True)
        return val_loss_sum(det_apply, final.params, val, DC, anchors_cat)

    rng = np.random.RandomState(8)
    d = np.zeros_like(np.asarray(imgs))
    d[0, 8:18, 8:18] = rng.randn(10, 10, 3)
    d[2, 4:10, 16:28] = rng.randn(6, 12, 3)
    d = jnp.asarray(d / np.linalg.norm(d))
    _, jvp_val = jax.jvp(jax.jit(f), (imgs,), (d,))
    analytic = float(jnp.sum(jnp.asarray(g) * d))
    np.testing.assert_allclose(analytic, float(jvp_val), rtol=5e-3,
                               atol=1e-7)


def test_driver_unrolled_epoch_with_backgrounds(setup):
    """Driver end-to-end: hypergrad_mode='unrolled' now runs the
    reference's mixed-dataset configuration (backgrounds merged into the
    inner-train schedule, neural_sim_main.py:729-781)."""
    import sys
    import tempfile

    sys.path.insert(0, "tests")
    from test_bilevel_e2e import tiny_cfg

    from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, bilevel=dataclasses.replace(cfg.bilevel,
                                         hypergrad_mode="unrolled"))
    key = jax.random.PRNGKey(0)
    models = init_nerf_pipeline_params(key, cfg.net, cfg.render.n_importance)
    val_imgs = np.zeros((2, 32, 32, 3), np.float32)
    val_imgs[0, 8:20, 8:20] = 0.9
    val_imgs[1, 12:28, 4:16] = 0.7
    vi, vb, vl, vv = build_detector_batches(val_imgs, [0, 1], cfg.detector)
    val = ValData(vi, vb, vl, vv)
    prng = np.random.RandomState(5)
    bg = np.clip(0.4 + 0.2 * prng.randn(2, cfg.camera.height,
                                        cfg.camera.width, 3),
                 0.05, 1.0).astype(np.float32)
    drv = BilevelDriver(cfg, models, val, key=key, object_class=0,
                        background_images=bg, background_labels=[1, 1],
                        output_dir=tempfile.mkdtemp())
    psi0 = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(2), cfg.detector)
    rec = drv.run_epoch(0, psi0, popt, det, save_pngs=False)
    assert np.isfinite(rec["grad_psi"]).all()
    assert rec["grad_psi"].shape == (8,)
