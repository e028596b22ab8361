"""dL_val/dpsi through pose sampling + rendering.

The reference computes this with a render-twice replay protocol and a
per-chunk double-VJP loop on the host (``render_path_grad``,
``optimization/utils/run_nerf_noscale.py:126-210``): for each pixel strip it
renders with the graph alive, then chains two ``torch.autograd.grad`` calls
(rgb->rays, rays->psi). Here the whole map psi -> poses -> rays -> rgb ->
<rgb, grad_E> is ONE differentiable jitted program, with two modes:

  - ``render_grad_psi_fwd``: forward-mode. psi has 8 dims, so the full
    Jacobian costs 8 JVP passes and stores NO residuals — this is the
    TPU-native default (reverse-mode through 50 images x 256 samples of MLP
    activations needs ~GBs of remat machinery; forward-mode needs none).
  - ``render_grad_psi_rev``: reverse-mode with per-tile rematerialization
    (rc.remat), kept for parity testing and for high-dimensional psi
    variants (e.g. Gaussian psi fields) where reverse-mode wins.

grad_E is the detector-side weight d(dL_train/dtheta)/dI . inverse_hvp from
neuralsim_tpu.hypergrad.influence — identical contract to the reference's
``grad_E`` (``neural_sim_main.py:855-911``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig, SamplerConfig
from neuralsim_tpu.ops.render import render_poses
from neuralsim_tpu.sampler.poses import (
    PoseNoise,
    poses_from_noise,
    poses_from_noise_gaussian,
    psi_to_probs,
)


def psi_poses(psi, noise, sc: SamplerConfig, psi_mode: str = "categorical"):
    """Differentiable psi -> poses map for either psi parameterization:
    categorical 8-bin logits (the reference's live mode) or gaussian
    (mean, std) over azimuth (completing the reference's sample-only
    gaussian variant, load_LINEMOD_noscale.py:304-328)."""
    if psi_mode == "gaussian":
        return poses_from_noise_gaussian(psi, noise, sc)
    probs = psi_to_probs(psi, sc)
    return poses_from_noise(probs, noise, sc)


def psi_outer_loss(models, psi, noise: PoseNoise, grad_E,
                   H: int, W: int, K, net: NeRFNetConfig, rc: RenderConfig,
                   sc: SamplerConfig, psi_mode: str = "categorical"):
    """L(psi) = mean_i <render(pose_i(psi)), grad_E_i>.

    grad_E plays the role of the cotangent on rendered rgb; grad_E:
    [P, H, W, 3], P <= K poses (the reference caps the pose loop at
    len(grad_E), run_nerf_noscale.py:142) — pass noise sliced to the same P.

    Two DELIBERATE deviations from the reference's dL/dpsi
    (``neural_sim_main.py:142-143, 191``), see PARITY.md:
      1. the gradient flows through softmax(psi/0.25) all the way to psi,
         whereas the reference makes the post-softmax probs the autograd
         leaf and applies dL/dprobs as if it were dL/dpsi (leaf trick —
         arguably a bug; chain-ruling through the softmax is the correct
         total derivative);
      2. normalization is mean-over-images, whereas the reference averages
         over per-chunk gradients (an extra factor of ceil(H*W/chunk)).
    Users porting reference ``opt_lr`` values should expect a different
    (better-conditioned) gradient scale.
    """
    poses = psi_poses(psi, noise, sc, psi_mode)
    out = render_poses(models, poses, H, W, K, None, net, rc)
    # sum over pixels of each image's <rgb, grad_E>, then mean over images
    return jnp.mean(jnp.sum(out["rgb_map"] * grad_E, axis=(1, 2, 3)))


def render_grad_psi_fwd(models, psi, noise: PoseNoise, grad_E,
                        H: int, W: int, K, net: NeRFNetConfig,
                        rc: RenderConfig, sc: SamplerConfig,
                        psi_mode: str = "categorical"):
    """Forward-mode dL/dpsi: one JVP per psi component, no stored residuals."""
    # f32 + explicit sin/cos under differentiation: gradient fidelity, and
    # the JVP/VJP of the bf16-cast + PE-projection forward graph trips an
    # XLA v5e backend RET_CHECK (lsrav2/live_range_finder.cc:29)
    rc = dataclasses.replace(rc, remat=False, pe_projection=False,
                             compute_dtype="float32", use_pallas=False)

    def loss(p):
        return psi_outer_loss(models, p, noise, grad_E, H, W, K, net, rc, sc,
                              psi_mode)

    basis = jnp.eye(psi.shape[0], dtype=psi.dtype)
    # serial over the (8 categorical / 2 gaussian) tangent directions: 1x
    # forward memory; vmap would batch all renders and multiply peak memory
    tangents = jax.lax.map(lambda v: jax.jvp(loss, (psi,), (v,))[1], basis)
    return tangents


def render_grad_psi_rev(models, psi, noise: PoseNoise, grad_E,
                        H: int, W: int, K, net: NeRFNetConfig,
                        rc: RenderConfig, sc: SamplerConfig,
                        psi_mode: str = "categorical"):
    """Reverse-mode dL/dpsi with per-tile remat (memory-bounded backward)."""
    rc = dataclasses.replace(rc, remat=True, pe_projection=False,
                             compute_dtype="float32", use_pallas=False)

    def loss(p):
        return psi_outer_loss(models, p, noise, grad_E, H, W, K, net, rc, sc,
                              psi_mode)

    return jax.grad(loss)(psi)


def psi_strip_loss(models, psi, noise_1: PoseNoise, grad_E_strip, start,
                   H: int, W: int, K, net: NeRFNetConfig, rc: RenderConfig,
                   sc: SamplerConfig, psi_mode: str = "categorical"):
    """<render(rays[start : start+S]), grad_E_strip> for ONE image.

    The outer loss is LINEAR in pixels, so dL/dpsi over an image is the sum
    of per-strip gradients — this is the single-strip term. ``start`` is
    either a STATIC python int — the compiled program slices the full ray
    grid at a compile-time offset, one program per strip index (the
    round-2-proven shape: the OLD v5e backend's register allocator
    RET_CHECKed, lsrav2/live_range_finder.cc:29, on (a) any lax.map/scan
    wrapper and (b) traced-offset dynamic slices; a single-tile reverse
    program over a statically-sliced grid was the verified-green
    formulation) — or a TRACED scalar (dynamic_start mode): ONE compiled
    program serves every strip offset via lax.dynamic_slice, legal since
    the 2026-08 libtpu fixed the scalar-address RET_CHECK. Same math;
    n_strips-fold fewer compiles."""
    from neuralsim_tpu.ops.rays import get_rays
    from neuralsim_tpu.ops.render import render_ray_batch

    pose = psi_poses(psi, noise_1, sc, psi_mode)[0]
    rays_o, rays_d = get_rays(H, W, K, pose[:3, :4])
    s = grad_E_strip.shape[0]
    if isinstance(start, int):
        ro = rays_o.reshape(-1, 3)[start:start + s]
        rd = rays_d.reshape(-1, 3)[start:start + s]
    else:
        ro = jax.lax.dynamic_slice_in_dim(rays_o.reshape(-1, 3), start, s)
        rd = jax.lax.dynamic_slice_in_dim(rays_d.reshape(-1, 3), start, s)
    out = render_ray_batch(models, ro, rd, None, net, rc)
    return jnp.sum(out["rgb_map"] * grad_E_strip)


def psi_strips_batch_loss(models, psi, noise_b: PoseNoise, grad_E_strips,
                          start, H: int, W: int, K,
                          net: NeRFNetConfig, rc: RenderConfig,
                          sc: SamplerConfig, psi_mode: str = "categorical"):
    """Sum over a BATCH of images of one pixel strip's <render, grad_E>.

    The batched generalization of psi_strip_loss: ``noise_b`` carries B
    pose-noise rows, ``grad_E_strips`` is [B, S, 3], and the B strips are
    flattened into ONE ray tile (caller sets rc.ray_chunk = B*S) — still a
    single scan-free statically-sliced program, the v5e-green shape, but
    with B fewer host dispatches per strip index. Exact: the outer loss is
    linear in pixels AND a plain sum over images (the caller divides by
    n_img once). ``start`` static or traced, as in psi_strip_loss."""
    from neuralsim_tpu.ops.rays import get_rays
    from neuralsim_tpu.ops.render import render_ray_batch

    poses = psi_poses(psi, noise_b, sc, psi_mode)            # [B, 4, 4]
    ro, rd = jax.vmap(lambda m: get_rays(H, W, K, m[:3, :4]))(poses)
    b, s = grad_E_strips.shape[0], grad_E_strips.shape[1]
    if isinstance(start, int):
        ro = ro.reshape(b, -1, 3)[:, start:start + s].reshape(-1, 3)
        rd = rd.reshape(b, -1, 3)[:, start:start + s].reshape(-1, 3)
    else:
        ro = jax.lax.dynamic_slice_in_dim(
            ro.reshape(b, -1, 3), start, s, axis=1).reshape(-1, 3)
        rd = jax.lax.dynamic_slice_in_dim(
            rd.reshape(b, -1, 3), start, s, axis=1).reshape(-1, 3)
    out = render_ray_batch(models, ro, rd, None, net, rc)
    return jnp.sum(out["rgb_map"] * grad_E_strips.reshape(-1, 3))


def psi_gather_loss(models, psi, noise_1: PoseNoise, grad_E_sel, idx,
                    H: int, W: int, K, net: NeRFNetConfig, rc: RenderConfig,
                    sc: SamplerConfig, psi_mode: str = "categorical"):
    """<render(rays[idx]), grad_E_sel> for ONE image: the ray subset is a
    TRACED int32 index vector instead of a contiguous strip.

    This is the occupancy-culled strips gradient's program body: the
    caller pre-selects (outside the differentiated program) the rays whose
    psi-gradient can be nonzero — rays missing every occupied voxel see
    zero density under relu along their whole length, so every rgb partial
    w.r.t. (o, d) vanishes identically and dropping them is exact up to
    the grid's conservativeness (the same contract as the forward cull,
    ops.occupancy). The backward of the gather is a scatter-add into the
    [H*W, 3] ray grids — legal on the 2026-08 libtpu (older v5e backends
    RET_CHECKed on traced addressing inside differentiated renders)."""
    from neuralsim_tpu.ops.rays import get_rays
    from neuralsim_tpu.ops.render import render_ray_batch

    pose = psi_poses(psi, noise_1, sc, psi_mode)[0]
    rays_o, rays_d = get_rays(H, W, K, pose[:3, :4])
    ro = jnp.take(rays_o.reshape(-1, 3), idx, axis=0)
    rd = jnp.take(rays_d.reshape(-1, 3), idx, axis=0)
    out = render_ray_batch(models, ro, rd, None, net, rc)
    return jnp.sum(out["rgb_map"] * grad_E_sel)


def psi_gather_batch_loss(models, psi, noise_b: PoseNoise, grad_E_sel, idx,
                          H: int, W: int, K, net: NeRFNetConfig,
                          rc: RenderConfig, sc: SamplerConfig,
                          psi_mode: str = "categorical"):
    """Batched psi_gather_loss: B images' index-selected ray chunks
    flattened into ONE tile (idx [B, S], grad_E_sel [B, S, 3]); the caller
    divides by n_img once. Padded images carry ZERO grad_E — linearity in
    the cotangent makes their contribution exactly zero."""
    from neuralsim_tpu.ops.rays import get_rays
    from neuralsim_tpu.ops.render import render_ray_batch

    poses = psi_poses(psi, noise_b, sc, psi_mode)            # [B, 4, 4]
    ro, rd = jax.vmap(lambda m: get_rays(H, W, K, m[:3, :4]))(poses)
    b = idx.shape[0]
    ro = jnp.take_along_axis(ro.reshape(b, -1, 3), idx[..., None], axis=1)
    rd = jnp.take_along_axis(rd.reshape(b, -1, 3), idx[..., None], axis=1)
    out = render_ray_batch(models, ro.reshape(-1, 3), rd.reshape(-1, 3),
                           None, net, rc)
    return jnp.sum(out["rgb_map"] * grad_E_sel.reshape(-1, 3))


def render_grad_psi_strips(models, psi, noise: PoseNoise, grad_E,
                           H: int, W: int, K, net: NeRFNetConfig,
                           rc: RenderConfig, sc: SamplerConfig,
                           psi_mode: str = "categorical",
                           strip: int | None = None,
                           jit_cache: dict | None = None,
                           image_batch: int = 1,
                           mesh=None,
                           compute_dtype: str = "float32",
                           dynamic_start: bool = False,
                           grid=None,
                           hit_budget: float = 1.0):
    """dL/dpsi = mean over images of sum over pixel strips of strip grads.

    Host loop over (image batch, strip); every compiled program is one
    scan-free single-tile reverse-mode render — the robust shape on the
    current v5e backend. Mathematically exact (linearity in pixels; mean
    over images mirrors the reference's normalization,
    neural_sim_main.py:191).

    ``image_batch`` > 1 folds that many images' strips into ONE program
    (one ray tile of image_batch*strip rays): same green shape, B-fold
    fewer dispatches over the high-latency relay — the round-3 verdict's
    400^2 scaling concern. The image tail is padded with repeated noise +
    ZERO grad_E (exact: the loss is linear in grad_E).

    ``mesh``: with a ('data', ...) jax.sharding.Mesh, the image batch is
    additionally sharded over the data axis via shard_map — each chip
    renders/differentiates its own image subset (the same embarrassing
    parallelism as the forward render) and the psi cotangent is psum-ed by
    the shard_map transpose. image_batch is rounded up to a multiple of
    the axis size.

    ``jit_cache``: optional dict reused across calls/epochs so the strip
    program compiles once.

    ``compute_dtype``: MLP matmul dtype inside the differentiated render.
    Default float32 (the round-2-proven shape — differentiating the
    bf16-cast graph used to trip the old backend's RET_CHECK). The
    2026-08 libtpu fixed that, so "bfloat16" is now a legal fast mode:
    the reverse pass rides the MXU at bf16 rate. psi has 8 dims and the
    update is a sign/direction signal through softmax — hardware-probed
    bf16-vs-f32 gradient cosine is recorded by scripts/probe_grad_400.py
    before any default flips.

    ``dynamic_start``: pass the strip offset as a TRACED scalar so ONE
    compiled program serves every same-length strip (lax.dynamic_slice
    ray selection) instead of one program per offset — n_strips-fold
    fewer compiles at 400^2 (32 -> 1, ~36 min of first-epoch compile).
    Requires the 2026-08 libtpu (older backends RET_CHECK on
    traced-offset slices in differentiated renders, the round-2 bisect);
    default False until the hardware probe validates it.

    ``grid`` + ``hit_budget`` < 1: occupancy-CULLED strips — one cheap
    non-differentiated selection program scores every ray of every image
    against the occupied AABB (ops.occupancy.ray_aabb_bounds) and the
    strip programs then gather-render only the top hit_budget fraction
    of rays. Rays missing every occupied voxel have identically zero
    psi-gradient (zero density under relu along their full length), so
    the culled gradient is exact up to the grid's conservativeness —
    the same contract as the forward production cull. At the YCB-V
    ~25% hit fraction this divides both FLOPs and dispatch count ~4x.
    If an image's true hit count overflows the static budget, THAT image
    falls back to gather-rendering every pixel (logged) while the others
    keep their selection — never a silently truncated gradient, never a
    whole-call cost cliff. Gather selection subsumes
    ``dynamic_start`` (the index vector is already a traced operand, so
    there is ONE program per strip length).

    The NeRF params are CLOSED OVER by the jitted program, not passed as
    arguments: the round-2 TPU bisect (V1/V3 green, V2 red) showed the v5e
    register allocator also RET_CHECKs when the differentiated render takes
    the model pytree as a jit argument — embedding it as a constant is the
    verified-green formulation. Each cache entry stores the params leaf it
    was compiled against and is replaced when the caller's leaf differs by
    identity — keying on a bare id() would silently serve a program with
    STALE embedded weights if CPython reused a GC'd pytree's id (ADVICE
    r2); the stored leaf pins the object (the program closes over the
    whole pytree anyway), so the identity check is sound for jax and
    numpy leaves alike.
    """
    n_img = grad_E.shape[0]
    n_pix = H * W
    strip = min(strip or rc.ray_chunk, n_pix)
    n_strips = -(-n_pix // strip)
    ge_flat = grad_E.reshape(n_img, n_pix, 3)

    cache = jit_cache if jit_cache is not None else {}
    leaf = jax.tree_util.tree_leaves(models)[0]

    ib = max(1, int(image_batch))
    n_data = 1
    if mesh is not None:
        n_data = mesh.shape["data"]
        ib = -(-max(ib, n_data) // n_data) * n_data

    if grid is not None and hit_budget < 1.0:
        return _render_grad_strips_culled(
            models, psi, noise, ge_flat, H, W, K, net, rc, sc, psi_mode,
            strip, cache, leaf, ib, n_data, mesh, compute_dtype,
            grid, hit_budget)

    if ib == 1:
        def strip_fn(start: int, s: int):
            # static mode: one compiled program per (start, length); the
            # tail strip is its own (smaller) program — no padding, no
            # dynamic offsets. dynamic mode: one program per LENGTH, the
            # offset is a runtime argument.
            ckey = ("strip_grad", None if dynamic_start else start, s,
                    H, W, psi_mode, compute_dtype)
            entry = cache.get(ckey)
            if entry is None or entry[0] is not leaf:
                rc_strip = dataclasses.replace(
                    rc, remat=False, pe_projection=False,
                    compute_dtype=compute_dtype, ray_chunk=s,
                    use_pallas=False)

                def grad_at(p, nz, ge, st):
                    return jax.grad(
                        lambda pp: psi_strip_loss(models, pp, nz, ge, st,
                                                  H, W, K, net, rc_strip, sc,
                                                  psi_mode))(p)

                if dynamic_start:
                    program = jax.jit(grad_at)
                else:
                    fixed = start  # static python int baked into the trace
                    program = jax.jit(
                        lambda p, nz, ge: grad_at(p, nz, ge, fixed))
                cache[ckey] = (leaf, program)
            return cache[ckey][1]

        total = jnp.zeros_like(psi)
        for i in range(n_img):
            noise_1 = jax.tree_util.tree_map(lambda x: x[i:i + 1], noise)
            for si in range(n_strips):
                start = si * strip
                s = min(strip, n_pix - start)
                ge = ge_flat[i, start:start + s]
                fn = strip_fn(start, s)
                total = total + (
                    fn(psi, noise_1, ge, jnp.asarray(start, jnp.int32))
                    if dynamic_start else fn(psi, noise_1, ge))
        return total / n_img

    # the mesh path keeps static offsets (the offset would need replicating
    # into the shard body, and its dispatch count is already divided by the
    # data-axis size) — dynamic offsets apply to the single-host batch path
    dyn_b = dynamic_start and mesh is None

    def batch_fn(start: int, s: int):
        key = ("strip_grad_batch", None if dyn_b else start, s, ib,
               H, W, psi_mode, n_data, rc.remat, compute_dtype)
        entry = cache.get(key)
        if entry is None or entry[0] is not leaf:
            # remat is honored here (unlike the proven single-image shape,
            # which pins remat=False): the batched program is still ONE
            # tile, and single-tile remat reverse mode is a distinct
            # backend shape worth probing — it divides residual memory by
            # ~the sample count, letting rays-per-program (and so the
            # dispatch count) scale accordingly
            rc_strip = dataclasses.replace(
                rc, pe_projection=False,
                compute_dtype=compute_dtype, ray_chunk=(ib // n_data) * s,
                use_pallas=False)

            fixed = start  # static python int baked into the trace

            def batch_loss(pp, nz, ge, st):
                return psi_strips_batch_loss(models, pp, nz, ge, st, H, W,
                                             K, net, rc_strip, sc, psi_mode)

            if mesh is None:
                if dyn_b:
                    program = jax.jit(
                        lambda p, nz, ge, st: jax.grad(
                            lambda pp: batch_loss(pp, nz, ge, st))(p))
                else:
                    program = jax.jit(
                        lambda p, nz, ge: jax.grad(
                            lambda pp: batch_loss(pp, nz, ge, fixed))(p))
            else:
                from jax.sharding import PartitionSpec as P

                from neuralsim_tpu.parallel.mesh import shard_map_compat

                # per-shard local strip loss; the shard_map transpose
                # psums the replicated-psi cotangent across chips.
                # dynamic_start would need the offset replicated INTO the
                # shard body — keep the mesh path static (its dispatch
                # count is already divided by the axis size).
                sharded = shard_map_compat(
                    lambda p_, nz_l, ge_l: batch_loss(p_, nz_l, ge_l,
                                                      fixed).reshape(1),
                    mesh=mesh,
                    in_specs=(P(), P("data"), P("data")),
                    out_specs=P("data"),
                )
                program = jax.jit(
                    lambda p, nz, ge: jax.grad(
                        lambda pp: jnp.sum(sharded(pp, nz, ge)))(p))
            cache[key] = (leaf, program)
        return cache[key][1]

    def pad_batch(tree, ge, lo: int, hi: int):
        """Slice images [lo:hi], pad to ib with repeated noise rows and
        zero grad_E (zero cotangent -> exactly zero contribution)."""
        pad = ib - (hi - lo)
        nz = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x[lo:hi]] + ([jnp.broadcast_to(x[hi - 1:hi],
                                                (pad,) + x.shape[1:])]
                              if pad else []), axis=0),
            tree)
        ge_b = jnp.concatenate(
            [ge] + ([jnp.zeros((pad,) + ge.shape[1:], ge.dtype)]
                    if pad else []), axis=0)
        return nz, ge_b

    total = jnp.zeros_like(psi)
    for lo in range(0, n_img, ib):
        hi = min(lo + ib, n_img)
        for si in range(n_strips):
            start = si * strip
            s = min(strip, n_pix - start)
            nz, ge_b = pad_batch(noise, ge_flat[lo:hi, start:start + s],
                                 lo, hi)
            fn = batch_fn(start, s)
            g = (fn(psi, nz, ge_b, jnp.asarray(start, jnp.int32))
                 if dyn_b else fn(psi, nz, ge_b))
            if mesh is not None:
                # XLA:CPU collective rendezvous needs all shard threads of
                # ONE program at once — drain before the next dispatch
                # (see BilevelDriver._mesh_barrier)
                jax.block_until_ready(g)
            total = total + g
    return total / n_img


def _render_grad_strips_culled(models, psi, noise, ge_flat, H, W, K,
                               net: NeRFNetConfig, rc: RenderConfig,
                               sc: SamplerConfig, psi_mode: str,
                               strip: int, cache: dict, leaf,
                               ib: int, n_data: int, mesh,
                               compute_dtype: str, grid,
                               hit_budget: float):
    """Occupancy-culled strips gradient (see render_grad_psi_strips).

    ONE selection dispatch scores all images' rays against the occupied
    AABB; the differentiated programs then gather-render index chunks.
    All chunks share one compiled program per (length, batch) — the index
    vector is a traced operand."""
    import numpy as np

    from neuralsim_tpu.ops.occupancy import ray_aabb_bounds
    from neuralsim_tpu.ops.rays import get_rays

    n_img, n_pix = ge_flat.shape[0], H * W
    n_pad_full = -(-n_pix // strip) * strip
    k_sel = -(-max(1, int(round(n_pix * hit_budget))) // strip) * strip

    full = k_sel >= n_pix          # budget covers everything: skip top_k
    ovf_rows = np.zeros((n_img,), bool)
    if not full:
        # ---- selection: one non-differentiated program, ALL images ----
        skey = ("strip_sel", H, W, psi_mode, k_sel, n_img)
        entry = cache.get(skey)
        if entry is None or entry[0] is not grid.occ:
            def select_all(p, nz):
                poses = psi_poses(p, nz, sc, psi_mode)      # [P, 4, 4]
                ro, rd = jax.vmap(
                    lambda m: get_rays(H, W, K, m[:3, :4]))(poses)
                ro = ro.reshape(n_img, n_pix, 3)
                rd = rd.reshape(n_img, n_pix, 3)
                hit, _, _ = ray_aabb_bounds(grid, ro, rd, rc.near, rc.far)
                idx = jax.lax.top_k(hit.astype(jnp.float32), k_sel)[1]
                return idx.astype(jnp.int32), jnp.sum(hit, axis=-1)
            cache[skey] = (grid.occ, jax.jit(select_all))
        idx_all, hits = cache[skey][1](psi, noise)
        hits = np.asarray(hits)                              # one host sync
        ovf_rows = hits > k_sel
        if ovf_rows.any():
            # budget overflow: gather-render EVERY pixel of the OVERFLOWING
            # images through the same programs (never a silently truncated
            # gradient); images within budget keep their selection — a
            # per-image fallback, not a whole-call cost cliff
            import logging

            logging.getLogger(__name__).warning(
                "culled strips gradient: %d/%d images exceed budget %d "
                "(max hit count %d, hit_budget=%.3f); falling back to all "
                "%d pixels for those images this call",
                int(ovf_rows.sum()), n_img, k_sel, int(hits.max()),
                hit_budget, n_pix)
            if ovf_rows.all():
                full = True

    if full:
        # every pixel, index-padded to a strip multiple; the pad rows get
        # ZERO grad_E below so the repeated index contributes nothing
        idx_all = jnp.broadcast_to(
            jnp.minimum(jnp.arange(n_pad_full, dtype=jnp.int32), n_pix - 1),
            (n_img, n_pad_full))
        ovf_rows = np.zeros((n_img,), bool)

    def group_arrays(rows, idx_rows, n_sel):
        """Per-image-group (noise, ge, idx) with zero grad_E on pad tails."""
        rows_j = jnp.asarray(rows, jnp.int32)
        nz = jax.tree_util.tree_map(
            lambda x: jnp.take(x, rows_j, axis=0), noise)
        ge = jnp.take_along_axis(jnp.take(ge_flat, rows_j, axis=0),
                                 idx_rows[..., None], axis=1)
        if n_sel > n_pix:                                    # zero pad tail
            ge = ge.at[:, n_pix:].set(0.0)
        return nz, ge, idx_rows

    # (rows, idx[len(rows), n_sel], n_sel) per homogeneous-selection group;
    # each group runs through the SAME compiled gather programs (the index
    # vector is a traced operand) — only the chunk count differs
    groups = []
    if ovf_rows.any():
        ok = np.nonzero(~ovf_rows)[0]
        ov = np.nonzero(ovf_rows)[0]
        if ok.size:
            groups.append((ok, jnp.take(idx_all, jnp.asarray(ok, jnp.int32),
                                        axis=0), k_sel))
        full_idx = jnp.broadcast_to(
            jnp.minimum(jnp.arange(n_pad_full, dtype=jnp.int32), n_pix - 1),
            (ov.size, n_pad_full))
        groups.append((ov, full_idx, n_pad_full))
    else:
        groups.append((np.arange(n_img), idx_all,
                       n_pad_full if full else k_sel))

    rc_strip_base = dataclasses.replace(
        rc, pe_projection=False, compute_dtype=compute_dtype,
        use_pallas=False)

    if ib == 1:
        ckey = ("strip_grad_gather", strip, H, W, psi_mode, compute_dtype)
        entry = cache.get(ckey)
        if entry is None or entry[0] is not leaf:
            rc_strip = dataclasses.replace(rc_strip_base, remat=False,
                                           ray_chunk=strip)
            program = jax.jit(
                lambda p, nz, ge, ix: jax.grad(
                    lambda pp: psi_gather_loss(models, pp, nz, ge, ix,
                                               H, W, K, net, rc_strip, sc,
                                               psi_mode))(p))
            cache[ckey] = (leaf, program)
        fn = cache[ckey][1]

        total = jnp.zeros_like(psi)
        for rows, idx_rows, n_sel in groups:
            nz_g, ge_g, ix_g = group_arrays(rows, idx_rows, n_sel)
            for i in range(len(rows)):
                noise_1 = jax.tree_util.tree_map(
                    lambda x: x[i:i + 1], nz_g)
                for j0 in range(0, n_sel, strip):
                    total = total + fn(psi, noise_1,
                                       ge_g[i, j0:j0 + strip],
                                       ix_g[i, j0:j0 + strip])
        return total / n_img

    def batch_fn():
        key = ("strip_grad_gather_batch", strip, ib, H, W, psi_mode,
               n_data, rc.remat, compute_dtype)
        entry = cache.get(key)
        if entry is None or entry[0] is not leaf:
            rc_strip = dataclasses.replace(
                rc_strip_base, ray_chunk=(ib // n_data) * strip)

            def batch_loss(pp, nz, ge, ix):
                return psi_gather_batch_loss(models, pp, nz, ge, ix, H, W,
                                             K, net, rc_strip, sc, psi_mode)

            if mesh is None:
                program = jax.jit(
                    lambda p, nz, ge, ix: jax.grad(
                        lambda pp: batch_loss(pp, nz, ge, ix))(p))
            else:
                from jax.sharding import PartitionSpec as P

                from neuralsim_tpu.parallel.mesh import shard_map_compat

                sharded = shard_map_compat(
                    lambda p_, nz_l, ge_l, ix_l: batch_loss(
                        p_, nz_l, ge_l, ix_l).reshape(1),
                    mesh=mesh,
                    in_specs=(P(), P("data"), P("data"), P("data")),
                    out_specs=P("data"),
                )
                program = jax.jit(
                    lambda p, nz, ge, ix: jax.grad(
                        lambda pp: jnp.sum(sharded(pp, nz, ge, ix)))(p))
            cache[key] = (leaf, program)
        return cache[key][1]

    def pad_imgs(nz_g, ge_g, ix_g, lo: int, hi: int, j0: int):
        """Group images [lo:hi] padded to ib with repeated noise/idx rows
        and ZERO grad_E (zero cotangent -> exactly zero contribution)."""
        pad = ib - (hi - lo)
        nz = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x[lo:hi]] + ([jnp.broadcast_to(x[hi - 1:hi],
                                                (pad,) + x.shape[1:])]
                              if pad else []), axis=0),
            nz_g)
        ge = ge_g[lo:hi, j0:j0 + strip]
        ix = ix_g[lo:hi, j0:j0 + strip]
        if pad:
            ge = jnp.concatenate(
                [ge, jnp.zeros((pad,) + ge.shape[1:], ge.dtype)], axis=0)
            ix = jnp.concatenate(
                [ix, jnp.broadcast_to(ix[-1:], (pad,) + ix.shape[1:])],
                axis=0)
        return nz, ge, ix

    fn = batch_fn()
    total = jnp.zeros_like(psi)
    for rows, idx_rows, n_sel in groups:
        nz_g, ge_g, ix_g = group_arrays(rows, idx_rows, n_sel)
        for lo in range(0, len(rows), ib):
            hi = min(lo + ib, len(rows))
            for j0 in range(0, n_sel, strip):
                nz, ge, ix = pad_imgs(nz_g, ge_g, ix_g, lo, hi, j0)
                g = fn(psi, nz, ge, ix)
                if mesh is not None:
                    jax.block_until_ready(g)
                total = total + g
    return total / n_img
