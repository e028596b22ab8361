"""Typed configuration tree for the whole pipeline.

One config system instead of the reference's two uncoordinated ones (the
configargparse namespace of ``optimization/neural_sim_main.py:1215-1360`` and
the detectron2 CfgNode hard-coded in ``Detector.__init__``,
``optimization/neural_sim_main.py:594-622``). The reference's txt config
format and flag names remain ingestible for entry-point parity
(``parse_reference_config`` / ``config_from_flags``).
"""

from __future__ import annotations

import dataclasses

from dataclasses import dataclass, field
from typing import Optional, Tuple


# --------------------------------------------------------------------------- #
# Renderer / NeRF
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class NeRFNetConfig:
    """NeRF MLP architecture (reference run_nerf_helpers.py:70-122)."""

    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    skips: Tuple[int, ...] = (4,)
    multires: int = 10          # xyz positional-encoding frequencies -> 63 ch
    multires_views: int = 4     # viewdir encoding frequencies -> 27 ch
    i_embed: int = 0            # 0 = positional encoding, -1 = identity
    use_viewdirs: bool = True

    @property
    def input_ch(self) -> int:
        if self.i_embed == -1:
            return 3
        return 3 + 3 * 2 * self.multires

    @property
    def input_ch_views(self) -> int:
        if not self.use_viewdirs:
            return 0
        if self.i_embed == -1:
            return 3
        return 3 + 3 * 2 * self.multires_views

    @property
    def output_ch(self) -> int:
        # reference run_nerf_noscale.py:267 (5 if N_importance else 4); the
        # extra channel is unused by the viewdir head, kept for ckpt parity.
        return 4


@dataclass(frozen=True)
class RenderConfig:
    """Volume-rendering options (reference render_rays, run_nerf_noscale.py:390-501)."""

    n_samples: int = 64         # coarse samples/ray
    n_importance: int = 128     # fine importance samples/ray
    perturb: bool = True        # stratified jitter (off for test renders)
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    lindisp: bool = False
    ndc: bool = False
    ray_chunk: int = 8192       # rays per lax.map tile (static shape)
    compute_dtype: str = "float32"   # "bfloat16" = MXU fast path
    # rematerialize per-tile activations in reverse-mode grads; without this
    # the backward pass materializes every MLP residual for every tile
    # (~31 GB for 2x20k-ray tiles at 64+192 samples) and OOMs HBM
    remat: bool = False
    # run the MLP through the fused Pallas kernel (TPU only; forward path —
    # gradients recompute via the jnp reference implementation)
    # fused Pallas render kernel (wide-lane-PE MLP, kernels/raymarch.py) for
    # forward renders. Default ON: query_points gates on pallas_available()
    # so CPU runs fall back to the jnp path, and every gradient path forces
    # this off (custom_vjp would keep gradients exact, but the scan-free
    # strip programs are the verified-green shape on the v5e backend)
    use_pallas: bool = True
    # with use_pallas: march whole rays through the fused render-tile
    # kernel (MLP + compositing in VMEM) instead of MLP-only fusion + XLA
    # compositing. MEASURED (v5e round 2, interleaved in-program A/B at
    # 400^2): 210k vs 223k rays/s — the in-kernel compositing VPU chain
    # serializes against the MXU where XLA's separate pass overlaps with
    # the next tile's matmuls, and the fine pass runs smaller ray tiles
    # (T=3072 vs 4096). Correct (112dB vs the split path) but opt-in
    # until the schedule wins; gated to raw_noise_std == 0.
    fuse_compositing: bool = False
    # with use_pallas: march through the transposed (feature-major) fused
    # kernel — point generation, PE and the MLP run on channel planes with
    # the point dim in lanes, emitting channel-separated sigma [N,S] /
    # rgb [3,N,S] raw outputs for the XLA compositing pass. Avoids the
    # lane-padded [T,3] points/dirs and [T,4] raw HBM intermediates of the
    # point-major kernel (~40x padding at 4/128 lanes). MEASURED (v5e
    # round 3, interleaved in-program A/B at 400^2, 120dB vs the
    # point-major path): exact 224k->414k rays/s, production (cull +
    # tighten) 478k->836k. Compositing stays in XLA so it overlaps the
    # next tile's matmuls (the failure mode of fuse_compositing).
    # fuse_compositing, when set, takes precedence.
    fuse_pointgen: bool = True
    # positional-encoding formulation: projection (fast forward path) vs
    # explicit sin/cos (differentiation-safe; see ops.encoding docstring)
    pe_projection: bool = True
    # sparse fine pass: route only the top `fine_fraction` of rays (by
    # coarse occupancy) through the fine network; the rest keep coarse
    # outputs. 1.0 = exact hierarchical rendering (reference semantics).
    # YCB-V-style single-object scenes put >75% of rays on empty background,
    # so 0.25 cuts ~70% of render FLOPs with no visible change on-object.
    fine_fraction: float = 1.0
    # occupancy-grid ray culling (production data-generation mode): when an
    # OccupancyGrid is passed to the renderer and hit_budget < 1.0, only the
    # top hit_budget fraction of rays (ranked by occupied-sample count) run
    # the coarse+fine march; provably-empty rays get the analytic empty
    # outputs. Routed rays follow the exact reference semantics. 1.0 = off.
    hit_budget: float = 1.0
    # with culling on, additionally restrict each routed ray's samples to
    # its occupied z-interval (ops.occupancy.ray_z_bounds) and drop the
    # coarse count to n_samples_culled: the tightened interval is typically
    # ~1/8 of [near, far], so even 16 samples double the reference's
    # per-unit-length sample density on the object. NOT bit-exact vs the
    # reference march (sample positions move) — guarded by PSNR in bench
    # and tests. n_samples_culled=None keeps rc.n_samples.
    tighten_bounds: bool = False
    n_samples_culled: int | None = 16
    # with tighten_bounds, additionally drop the fine importance count on
    # routed rays: 64 samples concentrated in a ~1/8-length interval are
    # still ~4x the reference's per-unit-length fine density. Same
    # PSNR-guard discipline as n_samples_culled (the guard, not the
    # constant, is the contract). None keeps rc.n_importance. 0 selects
    # SINGLE-PASS production: routed rays march once, uniformly inside
    # their tightened z-interval, with no coarse/fine split at all — the
    # occupancy grid replaces the coarse network as the importance
    # mechanism (the grid-guided-sampling idea of the NerfAcc/Instant-NGP
    # family, TPU-shaped: one static-shape march, zero sample_pdf/sort).
    n_importance_culled: int | None = None
    # reuse the coarse network's raw outputs in the fine composite instead
    # of re-evaluating the coarse sample positions under the fine network:
    # the fine MLP marches ONLY the n_importance new samples, and the
    # composite merge-sorts (lax.sort, no gathers) coarse raws with fine
    # raws in z order. The reference re-evaluates all 64+128 positions with
    # the fine net (run_nerf_noscale.py:470-486), so this mixes the two
    # networks' predictions along one ray — NOT bit-exact; PSNR-guarded
    # like the other production levers. Saves n_samples/(n_samples +
    # n_importance) of the fine-pass MLP FLOPs.
    reuse_coarse: bool = False
    # cull scorer: "aabb" (default) = closed-form ray/bbox slab test —
    # zero gathers (the per-sample voxel probe costs ~715ms/pass at 1.28M
    # rays on v5e, measured round 3) with per-ray z bounds from the slab
    # entry/exit; "grid" = per-sample voxel probing (tighter z intervals
    # for concave scenes, reference-faithful occupancy semantics)
    cull_mode: str = "aabb"
    near: float = 0.3103964843749999   # pipeline default: info.near - 0.5
    far: float = 1.9297681884765627    # pipeline default: info.far + 0.5

    def test_mode(self) -> "RenderConfig":
        """No jitter, no noise — reference render_kwargs_test (run_nerf_noscale.py:336-338)."""
        return dataclasses.replace(self, perturb=False, raw_noise_std=0.0)

    def production_mode(self, n_samples: int = 16,
                        hit_budget_floor: float = 0.25) -> "RenderConfig":
        """The measured-fastest >40dB data-generation preset (round 4,
        v5e): occupancy cull + per-ray z tightening + SINGLE-PASS march
        (n_importance_culled=0) at ``n_samples`` uniform samples inside
        the tightened interval. Measured ladder on the bench scene at
        400^2 (rays/s per chip, PSNR vs exact): 24->4.61M@46.3, 20->
        5.23M@46.3, 16->6.33M@45.7, 12->7.10M@44.3, 8->9.50M@40.5.
        16 ships as the default/headline: 27% above the 5M north star
        at the same PSNR as the hierarchical reuse_ic32 point (45.7).
        ``hit_budget_floor`` is a floor only — the driver re-calibrates
        against the actual scene (calibrate_hit_budget) and the >40dB
        first-epoch guard + overflow containment enforce quality."""
        return dataclasses.replace(
            self.test_mode(), hit_budget=hit_budget_floor,
            tighten_bounds=True, n_samples_culled=n_samples,
            n_importance_culled=0)


@dataclass(frozen=True)
class CameraConfig:
    """Pinhole intrinsics (reference load_data_param, load_LINEMOD_noscale.py:166-199)."""

    height: int = 100
    width: int = 100
    focal: float = 1333.3333740234375 / 4.0
    # full 3x3 K; defaults follow logs/nerfdata/nerf_traindata_info.json / 4
    fx: float = 1333.3333740234375 / 4.0
    fy: float = 1334.2196044921875 / 4.0
    cx: float = 195.4293212890625 / 4.0
    cy: float = 200.63180541992188 / 4.0

    @property
    def K(self):
        import numpy as np

        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )


# --------------------------------------------------------------------------- #
# Pose-distribution sampler (psi)
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class SamplerConfig:
    """Gumbel-softmax pose sampler (reference load_LINEMOD_noscale.py:202-328)."""

    n_bins: int = 8
    bin_width_deg: float = 45.0
    bin_offset_deg: float = 22.5
    gumbel_temperature: float = 0.1     # --gumble_T
    softmax_temperature: float = 0.25   # fixed temp for psi->probs (neural_sim_main.py:85)
    theta_low_deg: float = 85.0
    theta_high_deg: float = 95.0
    radius: float = 1.01
    n_samples_k: int = 50               # --n_samples_K images per outer iter


# --------------------------------------------------------------------------- #
# Detector
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class DetectorConfig:
    """RetinaNet-R50-FPN inner-loop settings (reference neural_sim_main.py:594-622)."""

    num_classes: int = 6
    images_per_batch: int = 8
    base_lr: float = 2.5e-4
    max_iter: int = 50
    warmup_iters: int = 10
    momentum: float = 0.9
    weight_decay: float = 1e-4
    freeze_backbone: bool = True        # FREEZE_AT=6 — whole ResNet frozen
    # RetinaNet head/anchor parameters (detectron2 retinanet_R_50_FPN_3x defaults)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    iou_fg_threshold: float = 0.5
    iou_bg_threshold: float = 0.4
    score_threshold: float = 0.05
    nms_threshold: float = 0.5
    topk_per_level: int = 1000
    max_detections: int = 100
    image_size: int = 128               # model input side (square pad/resize)
    # pretrained init (reference --pretrain/--pretrain_weight,
    # neural_sim_main.py:602-606): when pretrain_weight is set (or pretrain
    # is true), init_detector loads the checkpoint via
    # models.convert_retinanet, keeping every shape-matching tensor and
    # freshly initializing the class-dependent head outputs — the same
    # skip-mismatched-shapes semantics as detectron2's checkpointer when
    # NUM_CLASSES differs from COCO.
    pretrain: bool = False
    pretrain_weight: Optional[str] = None
    # which feature feeds the FPN P6 conv: "c5" (detectron2 layout — the
    # reference's RetinaNet) or "p5" (torchvision retinanet_resnet50_fpn).
    # Must match the checkpoint in pretrain_weight; see
    # convert_retinanet.detect_p6_source.
    fpn_p6_source: str = "c5"
    # val-set streaming (single-chip): 0 = the whole val distribution is
    # device-resident (padded/stacked once — fastest at reference scale,
    # ~100s of images). > 0 = the driver keeps val images HOST-resident
    # and streams them through fixed-shape compiled programs in chunks of
    # about this many images, for real distributions too large for HBM;
    # applies to both evaluate() and the hypergradient val-grad pass.
    eval_stream_images: int = 0


# --------------------------------------------------------------------------- #
# Bilevel outer loop
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class BilevelConfig:
    """Outer-loop optimizer for psi (reference neural_sim_main.py:1144-1212)."""

    n_epochs: int = 50
    opt_lr: float = 5e-5
    opt_method: str = "momentum"        # sgd | momentum | Adam
    psi_pose_cats_mode: str = "5"       # 1~8 | uniform | two_13 | two_27 | three_123 | three_147
    optimization: bool = True
    # psi parameterization: "categorical" (8-bin logits, reference live
    # mode) | "gaussian" ((mean, std) azimuth — completes the reference's
    # sample-only variant, load_LINEMOD_noscale.py:304-328)
    psi_mode: str = "categorical"
    gauss_mean_init: float = 157.5      # degrees; bin-5 center
    gauss_std_init: float = 30.0
    # hypergradient engine: "influence" = the reference's approximation
    # (inverse-HVP . mixed partial, neural_sim_main.py:912-1069);
    # "unrolled" = the TRUE dL_val/dI by differentiating through the whole
    # inner-training scan with per-step remat (hypergrad/unrolled.py — a
    # capability torch autograd could not afford the reference; FD-exact,
    # ~2x inner-train compute)
    hypergrad_mode: str = "influence"
    # inverse-HVP solver: "onestep" reproduces the reference's live path
    # ((H + damping I) v, neural_sim_main.py:995-1018); "cg" and "lissa" are
    # real solvers for the branches the reference left dead (:984, :993);
    # "cg_normal" solves the SPD normal equations (A^2 + mu)x = Av — the
    # sign-correct inverse when the short-inner-train Hessian is indefinite
    # and plain cg/lissa diverge (scripts/diag_hypergrad_solvers.py);
    # "neumann" = 2v - Hv; "identity" = v.
    ihvp_solver: str = "onestep"
    ihvp_damping: float = 1e-2
    cg_iters: int = 10
    lissa_iters: int = 30
    # must exceed ||H + damping I||_2 (PSD H only); <= 0 = auto via power
    # iteration (influence.inverse_hvp)
    lissa_scale: float = 25.0
    # sign applied to the influence-mode grad_E before the psi chain rule.
    # The implicit function theorem gives dL_val/dI = -(d2L_tr/dI dtheta)
    # H^{-1} grad L_val — the reference OMITS this minus
    # (neural_sim_main.py:855-911 computes +mixed.ihvp and descends,
    # :1080-1083), so its influence updates ASCEND the val loss whenever the
    # approximation is accurate. -1.0 (default) is the IFT-correct descent
    # direction, matching the "unrolled" mode's true gradient (verified by
    # tests/test_influence.py::test_influence_ift_sign_matches_true_gradient);
    # +1.0 reproduces the reference's raw convention.
    influence_sign: float = -1.0
    grad_e_max_images: int = 100        # reference cap (neural_sim_main.py:876)
    # exploration floor on the pose-sampling distribution (categorical psi
    # only): sample/render/differentiate at (1-eps)*softmax(psi/T) +
    # eps/n_bins instead of the raw softmax, with the gradient chained
    # back to raw psi (sampler/poses.py:explore_mix_psi). Removes the
    # wrong-bin collapse trap of the bilevel dynamics (a concentrated-off-
    # target psi keeps >= eps/n_bins mass on every bin, so the recovery
    # gradient never vanishes). 0.0 (default) = reference parity.
    explore_eps: float = 0.0
    # psi render-gradient mode:
    #   "strips" (default): host loop over (image, pixel strip); every
    #     compiled program is one scan-free single-tile reverse-mode render.
    #     This is the only shape the CURRENT v5e backend compiles — its
    #     register allocator RET_CHECKs (lsrav2/live_range_finder.cc:29) on
    #     any lax.map/scan wrapping a differentiated render, which kills
    #     both multi-tile remat reverse mode and the 8-JVP lax.map
    #     (measured round 2: single-tile green, >=2 tiles/JVP-scan red).
    #   "fwd": 8 JVPs via lax.map (no residuals) — round-1 default.
    #   "rev": whole-group remat reverse mode.
    grad_mode: str = "strips"
    # ray tile size for the gradient render; kept smaller than the forward
    # chunk — large remat tiles have hit XLA backend register-allocation
    # RET_CHECKs on v5e (live_range_finder) at 25k rays. In strips mode
    # this is the per-program strip length: the scan-free single-tile
    # program CANNOT remat (multi-tile remat is RET_CHECK-red), so its
    # backward stores full residuals — ~1.5GB per 1k rays at 64+192
    # samples f32. 5000 leaves headroom for the detector/inner-train state
    # sharing HBM (a 10k strip OOMed the reference-scale epoch); each
    # distinct (start, length) compiles one program, cached persistently.
    grad_ray_chunk: int = 5000
    # images per render-gradient jit call: the gradient over all K images is
    # the mean of per-group gradients (the loss is a mean over images), and
    # differentiated render programs beyond ~4 image-tiles trip the same
    # backend RET_CHECK; grouping keeps each compiled program small
    grad_image_batch: int = 4
    # strips mode: images folded into ONE strip program (one ray tile of
    # strip_image_batch * grad_ray_chunk rays) — the same v5e-green
    # scan-free single-tile shape, B-fold fewer dispatches over the
    # ~200ms-latency relay (the 400^2/100-image scaling fix, VERDICT r3
    # #2). 1 = the round-2/3 proven one-image-per-program shape. On a
    # mesh the driver rounds this up to the data-axis size and shards the
    # batch across chips.
    strip_image_batch: int = 1
    # MLP matmul dtype inside the differentiated strip render. "bfloat16"
    # (default since round 5) rides the MXU at double rate; it became
    # legal with the 2026-08 libtpu (the old backend RET_CHECKed on
    # differentiated bf16-cast graphs). The accuracy gate that justified
    # the flip: hardware-probed bf16-vs-f32 gradient cosine 0.99999993 at
    # the 400^2 north-star shape, 2.60 s/image vs 4.00 f32
    # (scripts/results/probe_grad_400_nimg4.json). "float32" remains the
    # oracle shape for probes/tests.
    grad_compute_dtype: str = "bfloat16"
    # occupancy-culled strips gradient: fraction of each image's rays the
    # strip programs gather-render, selected by the occupied-AABB slab
    # test (ops.occupancy.ray_aabb_bounds). Rays missing every occupied
    # voxel have identically zero psi-gradient (zero density under relu
    # along their full length), so the culled gradient is exact up to the
    # grid's conservativeness; at the YCB-V ~25% hit fraction this cuts
    # the grad pass FLOPs and dispatch count ~4x. 0.0 = off (dense);
    # < 0 (default since round 5) = track the driver's CALIBRATED forward
    # hit_budget; > 0 = explicit fraction. Needs the production occupancy
    # grid (render.hit_budget < 1), else ignored — exact-render runs keep
    # the dense gradient automatically. Budget overflows fall back to all
    # pixels for the overflowing IMAGE only (logged), never truncate.
    # Hardware evidence for the flip: cull55 gradient cosine vs the dense
    # f32 oracle 0.999999999994; 2.28 s/image f32 / 1.49 bf16 vs 4.00
    # dense serial at 400^2 (scripts/results/probe_grad_400_nimg4.json).
    grad_hit_budget: float = -1.0
    # strips mode: pass the strip offset as a TRACED scalar so ONE compiled
    # program serves every strip index (lax.dynamic_slice ray selection)
    # instead of one program per static offset — n_strips-fold fewer
    # compiles at 400^2 (32 -> 1). Legal since the 2026-08 libtpu (older
    # v5e backends RET_CHECKed on traced-offset slices inside
    # differentiated renders). Default True since round 5: hardware probe
    # measured IDENTICAL gradients (cosine 1.0) and identical
    # steady-state s/image with first-call compile collapsed 3989 s ->
    # 259 s f32 / 65 s bf16 (scripts/results/probe_grad_400_nimg4.json).
    # Ignored by the mesh-sharded batch path (kept static there, see
    # render_grad). strip_image_batch stays 1: dyn_b2 compiles but runs
    # SLOWER (4.35 s/image vs 2.60 b1-bf16) — the batch frontier is now a
    # measured number, not a compile failure.
    grad_dynamic_start: bool = True


# --------------------------------------------------------------------------- #
# Data / experiment
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class DataConfig:
    basedir: str = "./logs"
    datadir: str = "./logs/nerfdata"
    expname: str = "exp_ycb_synthetic"
    object_id: str = "2"
    dataset_type: str = "LINEMOD"
    half_res: bool = True
    testskip: int = 0
    train_val_path_info: str = "./configs/ycb_synthetic_train_val_path_info.json"
    test_distribution: str = "one_1"
    ft_path: Optional[str] = None
    white_bkgd: bool = False
    render_factor: int = 0
    # keep rendered tensors on device end-to-end; when True also write PNGs
    # (the reference always round-trips through 8-bit PNGs,
    # run_nerf_noscale.py:245-250 -> dataset_mapper re-read)
    save_pngs: bool = True


@dataclass(frozen=True)
class TrainConfig:
    """Standalone NeRF training (reference run_nerf_noscale.py:503-791)."""

    n_iters: int = 200000
    n_rand: int = 1024
    lrate: float = 5e-4
    lrate_decay: int = 500              # exponential decay, in 1000s of steps
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    no_batching: bool = True
    i_print: int = 100
    i_weights: int = 10000
    i_testset: int = 50000
    i_video: int = 50000
    # short-circuit: skip training, render the spiral path (or the test set
    # with render_test) from the restored checkpoint and exit — reference
    # run_nerf_noscale.py:582-602
    render_only: bool = False
    render_test: bool = False


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. data axis shards rays/images; model axis is an
    optional TP axis for wide layers (low priority for the 256-wide MLP)."""

    data_axis: int = -1                 # -1: all devices on data axis
    model_axis: int = 1


@dataclass(frozen=True)
class NeuralSimConfig:
    net: NeRFNetConfig = field(default_factory=NeRFNetConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    camera: CameraConfig = field(default_factory=CameraConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    bilevel: BilevelConfig = field(default_factory=BilevelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    seed: int = 0

    def replace(self, **kw) -> "NeuralSimConfig":
        return dataclasses.replace(self, **kw)


# --------------------------------------------------------------------------- #
# Reference txt-config ingestion
# --------------------------------------------------------------------------- #


def parse_reference_config(path: str) -> dict:
    """Parse the reference's configargparse txt format (``key = value`` lines,
    ``#`` comments — e.g. configs/nerf_param_ycbv_general.txt)."""
    out: dict = {}
    with open(path, "r") as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            key, val = (s.strip() for s in line.split("=", 1))
            out[key] = _coerce(val)
    return out


def _coerce(val: str):
    low = val.lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    try:
        return int(val)
    except ValueError:
        pass
    try:
        return float(val)
    except ValueError:
        pass
    return val


# flag-name -> (section, field) mapping for the reference CLI surface
# (reference config_parser, neural_sim_main.py:1215-1360)
_FLAG_MAP = {
    "basedir": ("data", "basedir"),
    "datadir": ("data", "datadir"),
    "expname": ("data", "expname"),
    "object_id": ("data", "object_id"),
    "dataset_type": ("data", "dataset_type"),
    "half_res": ("data", "half_res"),
    "testskip": ("data", "testskip"),
    "train_val_path_info": ("data", "train_val_path_info"),
    "test_distribution": ("data", "test_distribution"),
    "ft_path": ("data", "ft_path"),
    "white_bkgd": ("data", "white_bkgd"),
    "render_factor": ("data", "render_factor"),
    "netdepth": ("net", "netdepth"),
    "netwidth": ("net", "netwidth"),
    "netdepth_fine": ("net", "netdepth_fine"),
    "netwidth_fine": ("net", "netwidth_fine"),
    "multires": ("net", "multires"),
    "multires_views": ("net", "multires_views"),
    "i_embed": ("net", "i_embed"),
    "use_viewdirs": ("net", "use_viewdirs"),
    "N_samples": ("render", "n_samples"),
    "N_importance": ("render", "n_importance"),
    "perturb": ("render", "perturb"),
    "raw_noise_std": ("render", "raw_noise_std"),
    "lindisp": ("render", "lindisp"),
    "chunk": ("render", "ray_chunk"),
    "N_rand": ("train", "n_rand"),
    "lrate": ("train", "lrate"),
    "lrate_decay": ("train", "lrate_decay"),
    "precrop_iters": ("train", "precrop_iters"),
    "precrop_frac": ("train", "precrop_frac"),
    "no_batching": ("train", "no_batching"),
    "i_print": ("train", "i_print"),
    "i_weights": ("train", "i_weights"),
    "i_testset": ("train", "i_testset"),
    "i_video": ("train", "i_video"),
    "render_only": ("train", "render_only"),
    "render_test": ("train", "render_test"),
    "n_iters": ("train", "n_iters"),      # extension: reference hardcodes 200k
    "n_samples_K": ("sampler", "n_samples_k"),
    "gumble_T": ("sampler", "gumbel_temperature"),
    "n_epochs": ("bilevel", "n_epochs"),
    "opt_lr": ("bilevel", "opt_lr"),
    "opt_method": ("bilevel", "opt_method"),
    "psi_pose_cats_mode": ("bilevel", "psi_pose_cats_mode"),
    "optimization": ("bilevel", "optimization"),
    "pretrain": ("detector", "pretrain"),
    "pretrain_weight": ("detector", "pretrain_weight"),
    # extensions with no reference analog (production occupancy culling,
    # gaussian psi, psi-gradient mode selection)
    "hit_budget": ("render", "hit_budget"),
    "tighten_bounds": ("render", "tighten_bounds"),
    "cull_mode": ("render", "cull_mode"),
    "n_samples_culled": ("render", "n_samples_culled"),
    "n_importance_culled": ("render", "n_importance_culled"),
    "use_pallas": ("render", "use_pallas"),
    "fine_fraction": ("render", "fine_fraction"),
    "psi_mode": ("bilevel", "psi_mode"),
    "grad_mode": ("bilevel", "grad_mode"),
    "ihvp_solver": ("bilevel", "ihvp_solver"),
    "cg_iters": ("bilevel", "cg_iters"),
    "lissa_iters": ("bilevel", "lissa_iters"),
    "lissa_scale": ("bilevel", "lissa_scale"),
    "grad_image_batch": ("bilevel", "grad_image_batch"),
    "strip_image_batch": ("bilevel", "strip_image_batch"),
    "grad_compute_dtype": ("bilevel", "grad_compute_dtype"),
    "grad_hit_budget": ("bilevel", "grad_hit_budget"),
    "grad_dynamic_start": ("bilevel", "grad_dynamic_start"),
    "eval_stream_images": ("detector", "eval_stream_images"),
    "reuse_coarse": ("render", "reuse_coarse"),
    "ndc": ("render", "ndc"),
}

# flags the reference accepts but that have no effect on this implementation
# (llff/deepvoxels paths, netchunk-style serial chunking, tensorboard cadence)
_IGNORED_FLAGS = {
    "config", "netchunk", "no_reload",
    "shape", "factor", "no_ndc", "spherify", "llffhold", "i_img",
}


def config_from_flags(flags: dict, base: Optional[NeuralSimConfig] = None) -> NeuralSimConfig:
    """Build a NeuralSimConfig from a dict of reference-style flag values."""
    cfg = base or NeuralSimConfig()
    flags = dict(flags)
    # one-flag production preset (round-4 bench headline: single-pass
    # grid-guided rendering); applied BEFORE field flags so explicit
    # --n_samples_culled etc. still override the preset
    if flags.pop("production_render", False):
        cfg = dataclasses.replace(cfg, render=cfg.render.production_mode())
    sections = {
        "net": dict(), "render": dict(), "camera": dict(), "sampler": dict(),
        "detector": dict(), "bilevel": dict(), "data": dict(), "train": dict(),
    }
    for key, val in flags.items():
        if key in _IGNORED_FLAGS:
            continue
        if key not in _FLAG_MAP:
            raise KeyError(f"unknown flag: --{key}")
        sec, fieldname = _FLAG_MAP[key]
        if isinstance(val, str) and val == "None":
            # nullable knobs (n_samples_culled / n_importance_culled / ...)
            # accept `--flag None` to restore the disabled state; without
            # this the truthy string "None" would flow into sample-count
            # arithmetic at trace time
            val = None
        if key == "perturb":            # reference uses float 0/1
            val = bool(val)
        if key in ("optimization", "pretrain"):
            val = bool(val)
        if key in ("object_id", "psi_pose_cats_mode"):
            val = str(val)
        sections[sec][fieldname] = val
    return dataclasses.replace(
        cfg,
        **{
            name: dataclasses.replace(getattr(cfg, name), **vals)
            for name, vals in sections.items()
            if vals
        },
    )


def load_config(config_path: Optional[str] = None, overrides: Optional[dict] = None) -> NeuralSimConfig:
    """txt config + CLI overrides, reference precedence (CLI > file > defaults)."""
    flags: dict = {}
    if config_path:
        flags.update(parse_reference_config(config_path))
    if overrides:
        flags.update(overrides)
    return config_from_flags(flags)


def parse_cli(argv=None) -> NeuralSimConfig:
    """Reference-compatible CLI: ``--config file.txt`` + ``--flag value`` pairs."""
    import argparse

    parser = argparse.ArgumentParser("neuralsim_tpu")
    parser.add_argument("--config", type=str, default=None)
    known, rest = parser.parse_known_args(argv)
    overrides: dict = {}
    it = iter(rest)
    for tok in it:
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument {tok!r}")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            overrides[key] = _coerce(val)
            continue
        # reference store_true flags
        if key in ("no_batching", "use_viewdirs", "white_bkgd", "half_res",
                   "lindisp", "no_reload", "render_only", "render_test",
                   "no_ndc", "spherify", "production_render"):
            overrides[key] = True
            continue
        overrides[key] = _coerce(next(it))
    return load_config(known.config, overrides)
