"""The jitted per-frame training step.

One device dispatch per frame covers what the reference spreads over
hundreds of Python-level torch calls (train.py:195-326):

  1. keyframe + pixel sampling for every object slot (vmap over the bank;
     reference: per-object Python loop vmap.py:319-364),
  2. depth-guided 3D sampling (branch-free, ops/sampling.py),
  3. ``lax.scan`` over the ``n_iter_per_frame`` optimisation iterations,
     each doing PE -> ensemble MLP -> volume render -> masked losses ->
     masked AdamW on both the object bank and the background bank
     (reference: Python for-loop with functorch vmap + torch autograd,
     train.py:270-326),

with all tensors resident in HBM. The XLA-scan path donates parameters
(updated in place); the fused-kernel path does NOT donate by default —
see the VMAP_DONATE note in make_frame_step for the measured reason.

Sampling parity notes:
  * keyframe choice: uniform over local slots [0, n_kf) with the latest two
    keyframes always included when n_kf > 2 (vmap.py:321-341);
  * pixel choice: uniform inside the per-keyframe 2D bbox, truncated to int
    (vmap.py:343-351);
  * per-object pixel state derived from the pooled instance map:
    1 = this object, 2 = unknown (-1 in the instance map), 0 = other
    (train.py:128-137);
  * gt rgb scaled by 1/255 at use (train.py:257).
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp

from vmap_tpu.core.bank import BankState, apply_adamw
from vmap_tpu.ops import losses as L
from vmap_tpu.ops import rays as R
from vmap_tpu.ops import sampling as S
from vmap_tpu.ops.embedding import embed
from vmap_tpu.ops.mlp import mlp_apply


@dataclass(frozen=True)
class StepStatics:
    """Static (compile-time) configuration of the train step."""
    n_iter: int = 20
    # object bank sampling
    win: int = 5
    n_px: int = 24
    n_b2s: int = 1           # n_bins_cam2surface
    n_bins: int = 9
    # background bank sampling
    do_bg: bool = True
    win_bg: int = 10
    n_px_bg: int = 120
    n_b2s_bg: int = 5
    # shared
    min_depth: float = 0.0
    surface_eps: float = 0.1
    stop_eps: float = 0.05
    depth_scale: float = 1e-3
    lr: float = 1e-3
    wd: float = 0.013
    color_scaling: float = 5.0
    opacity_scaling: float = 10.0
    emb1: int = 87
    max_deg: int = 5
    compute_dtype: str = "float32"
    # camera intrinsics (ray directions are computed analytically from the
    # sampled pixel coordinates — no [W, H, 3] direction-cache gather)
    fx: float = 600.0
    fy: float = 600.0
    cx: float = 599.5
    cy: float = 339.5
    # multi-device: constrain the background ray batch to the "data" mesh
    # axis (data-parallel bg; XLA then psums bg grads). Requires an active
    # mesh (jax.sharding.use_mesh) at trace time.
    shard_data_axis: bool = False
    # run the field forward/backward through the fused Pallas kernel
    # (kernels/ensemble.py custom VJP) instead of the XLA vmap path
    use_pallas_train: bool = False
    # run the WHOLE per-frame optimisation through the monolithic fused
    # Pallas kernel (kernels/train_step.py): banks are held in prepared
    # block layout (PreparedBank) across frames; measured 3.4x faster than
    # the XLA scan path on v5e (15.5 ms vs 53.6 ms per 100-object frame)
    use_fused_frame: bool = False
    # frames per device dispatch (fused path only). The axon tunnel pays a
    # flat ~0.5-1.4 ms of NON-OVERLAPPED cost per dispatch (measured,
    # scripts/microbench_dispatch.py: independent chains do not pipeline);
    # a burst of K frames in ONE dispatch (lax.scan over per-frame
    # keyframe-table snapshots + keys) amortises it K-fold. Semantically
    # exact: frame N's step consumes table snapshot N, and the Mapper
    # flushes the burst queue before any bank mutation (object activation)
    # or pool-slot reuse that a queued snapshot references.
    dispatch_burst: int = 1
    # pixel-sampling granularity: 1 draws every pixel independently
    # (reference-exact, vmap.py:343-351); L>1 draws runs of L v-contiguous
    # pixels from an L-aligned grid, cutting the pool-gather element count
    # Lx (TPU gathers cost per element, not per byte). Requires n_px % L
    # == 0 and H % L == 0. Separate knobs per bank: the background's row
    # coverage (120 px over the whole image) starves under blocking long
    # before the objects' bbox-local sampling does (docs/quality_study.json)
    # — and the object bank owns ~91% of the gather elements anyway.
    px_block: int = 1
    px_block_bg: int = 1
    # iteration-reuse sampling (object bank): R > 1 draws the pixel batch
    # for only n_iter/R iteration-blocks and CYCLES them across the frame's
    # n_iter iterations (each block trained R times, epochs-style), with
    # per-iteration z samples still drawn fresh. Cuts the pool-gather
    # element count Rx — the dominant non-kernel cost at px_block 1 —
    # while every pixel stays individually uniform inside the bbox
    # (vmap.py:343-351), unlike px_block's spatially-clustered runs. The
    # deviation from the reference is across-ITERATION freshness only
    # (reference redraws every iteration, train.py:270-326). Requires
    # n_iter % R == 0. Background keeps fresh draws (its gather is ~9% of
    # the elements; see px_block_bg for its own knob).
    sample_reuse: int = 1


def _kernel_mm_policy(compute_dtype: str) -> str:
    """StepStatics.compute_dtype -> fused-kernel matmul dtype policy.
    "float32" -> all-f32; "bfloat16" -> all-bf16 operands (f32 accumulate);
    "bwd_bf16" -> f32 forward, bf16 backward matmuls (quality-neutral:
    gradient rounding is absorbed by AdamW's second-moment normalisation);
    "int8" -> all MLP matmul operands dynamically quantised to s8 with s32
    accumulate (2x MXU pass rate on v5e; render/loss/Adam/PE stay f32);
    "int8_fwd" -> quantised forward only (diagnostic half-policy);
    "int8_static"/"int8_static_fwd" -> as int8/int8_fwd but with static
    activation/gradient scales (no in-loop abs-max reduce — see
    kernels/train_step._mm_policy).
    """
    return {"float32": "f32", "bfloat16": "bf16", "bwd_bf16": "bwd_bf16",
            "int8": "int8", "int8_fwd": "int8_fwd",
            "int8_static": "int8_static",
            "int8_static_fwd": "int8_static_fwd"}[compute_dtype]


def pick_group(capacity: int, hidden: int) -> int:
    """Largest MXU-friendly object group size dividing the bank capacity:
    128/hidden objects share one 128-wide block-diagonal tile."""
    G = max(128 // hidden, 1)
    while G > 1 and capacity % G:
        G //= 2
    return G


def _sample_bank(key, pool_packed, pool_twc,
                 kf_pool_slot, kf_bbox, n_kf, latest2, obj_ids,
                 n_frames: int, n_px: int, n_b2s: int, st: StepStatics,
                 keys=None, px_block: int | None = None, reuse: int = 1,
                 tile_pixels: bool = True):
    """Vectorised training-sample gather for a whole bank.

    Returns dict of [cap, n_frames*n_px, ...] arrays (rays flattened like
    train.py:213-218). The pool is word-packed (core/pool.py): one 2xu32
    gather per ray replaces five sub-word gathers (~2x faster on TPU), and
    ray directions come from the pinhole formula instead of a cache gather.

    ``keys`` (optional) supplies the per-slot keys directly (shape
    [cap, 2]) instead of splitting ``key`` — the sharded fused step
    pre-splits GLOBALLY and passes each shard its slice, so every slot
    draws the same stream it would single-device.
    """
    cap = kf_pool_slot.shape[0]
    W = pool_packed.shape[1]
    H = pool_packed.shape[2]

    L = st.px_block if px_block is None else px_block
    if L > 1 and pool_packed.size * 4 >= 2 ** 31:
        # XLA:TPU backend fault (measured 2026-08-20, docs/round_notes.md
        # round 5): block-slice gathers ([L, 2]-slice per index) from pool
        # arrays >= 2 GiB die with "TPU backend error (Internal)" at the
        # first readback, while the per-pixel 2xu32 gather on the same
        # array works. Demote to the per-pixel path (px_block 1 — the
        # reference-exact sampling) on jumbo pools; trace-time branch, so
        # this costs nothing when the pool is small.
        import warnings
        warnings.warn(
            f"px_block {L} demoted to 1: frame pool is "
            f"{pool_packed.size * 4 / 2**30:.2f} GiB and block-slice "
            "gathers from >=2 GiB arrays fault in the XLA:TPU backend "
            "(see docs/round_notes.md round 5)")
        L = 1
    assert n_px % L == 0 and H % L == 0, (n_px, H, L)
    assert n_frames % reuse == 0, (n_frames, reuse)
    n_eff = n_frames // reuse     # keyframe picks actually drawn/gathered
    n_rays = n_frames * n_px
    n_rays_eff = n_eff * n_px
    f32 = jnp.float32

    def sample_one(key, kf_pool, bbox_tab, n_kf1, latest2_1, obj_id):
        k_kf, k_u, k_v, k_z = jax.random.split(key, 4)
        n_safe = jnp.maximum(n_kf1, 1)
        ids_a = jnp.floor(
            jax.random.uniform(k_kf, (n_eff,)) * n_safe).astype(jnp.int32)
        ids_a = jnp.minimum(ids_a, n_safe - 1)
        ids_b = jnp.concatenate([ids_a[: n_eff - 2], latest2_1.astype(jnp.int32)])
        kf_local = jnp.where(n_kf1 > 2, ids_b, ids_a)

        bbox = bbox_tab[kf_local]  # [n_eff, 4] = [u0, u1, v0, v1]
        pool_ids = kf_pool[kf_local]  # [n_eff]
        pid = pool_ids[:, None]
        if L == 1:
            uu = jax.random.uniform(k_u, (n_eff, n_px))
            vv = jax.random.uniform(k_v, (n_eff, n_px))
            u = jnp.floor(uu * (bbox[:, 1] - bbox[:, 0])[:, None]
                          + bbox[:, 0][:, None])
            v = jnp.floor(vv * (bbox[:, 3] - bbox[:, 2])[:, None]
                          + bbox[:, 2][:, None])
            u = jnp.clip(u.astype(jnp.int32), 0, W - 1)
            v = jnp.clip(v.astype(jnp.int32), 0, H - 1)
            g = pool_packed[pid, u, v]                # [n_eff, NP, 2] u32
        else:
            # block mode: draw n_px/L (u, v-block) pairs; each gather pulls
            # an L-run of v-contiguous pixels from the L-aligned grid. Same
            # pixel budget, L x fewer gather elements (TPU gathers cost per
            # element). v-blocks are uniform over blocks intersecting the
            # bbox, so coverage matches the per-pixel draw up to <=L-1 px
            # of block-edge spill (bboxes are enlarged by 0.2 anyway).
            nb = n_px // L
            uu = jax.random.uniform(k_u, (n_eff, nb))
            vv = jax.random.uniform(k_v, (n_eff, nb))
            u_b = jnp.floor(uu * (bbox[:, 1] - bbox[:, 0])[:, None]
                            + bbox[:, 0][:, None])
            u_b = jnp.clip(u_b.astype(jnp.int32), 0, W - 1)
            b0 = jnp.floor(bbox[:, 2] / L)
            b1 = jnp.ceil(bbox[:, 3] / L)
            nblk = jnp.maximum(b1 - b0, 1.0)
            v_b = jnp.floor(vv * nblk[:, None] + b0[:, None])
            v_b = jnp.clip(v_b.astype(jnp.int32), 0, H // L - 1)
            pool_r = pool_packed.reshape(
                pool_packed.shape[0], W, H // L, L, 2)
            g = pool_r[pid, u_b, v_b]                 # [n_eff, nb, L, 2]
            g = g.reshape(n_eff, n_px, 2)
            u = jnp.repeat(u_b, L, axis=1)
            v = (v_b[:, :, None] * L
                 + jnp.arange(L, dtype=jnp.int32)).reshape(n_eff, n_px)
        # Layout note (round 3): everything below the gather runs on FLAT
        # [n_rays] arrays (full 128-lane vreg density) with vec3/sample
        # axes LEADING — the original [NF, NP(, 3|S)] layouts put 24-, 3-
        # or 10-wide axes in the lanes and paid a 5-12x VPU density tax
        # (the sampler was ~2.6 ms of the frame; see docs/round_notes.md).
        g = g.reshape(n_rays_eff, 2)
        w0 = g[:, 0]
        w1 = g[:, 1]
        rgb_sm = (jnp.stack([w0 & 255, (w0 >> 8) & 255, (w0 >> 16) & 255],
                            axis=0).astype(f32) / 255.0)       # [3, NR]
        depth = (w1 & 0xFFFF).astype(f32) * 1e-3  # mm -> m
        inst_b = ((w1 >> 16) & 0xFFFF).astype(jnp.int32)  # biased by +1
        state = jnp.where(inst_b == obj_id + 1, S.THIS_OBJ,
                          jnp.where(inst_b == 0, S.UNKNOWN_OBJ, S.OTHER_OBJ))

        # pinhole dirs per COMPONENT (vmap.py:508-524 semantics), rotated
        # to world frame via per-keyframe rotation rows broadcast over the
        # pixel axis — 15 multiply-adds at [NF, NP], no batched 3x3 einsum
        dx = (u.astype(f32) - st.cx) / st.fx          # [NF, NP]
        dy = (v.astype(f32) - st.cy) / st.fy
        twc = pool_twc[pool_ids]                      # [NF, 4, 4]
        rot = twc[:, :3, :3]
        dirs_sm = jnp.stack([
            (rot[:, i, 0][:, None] * dx + rot[:, i, 1][:, None] * dy
             + rot[:, i, 2][:, None]).reshape(n_rays_eff)
            for i in range(3)], axis=0)               # [3, NR_eff]
        org = twc[:, :3, 3]                           # [n_eff, 3]
        origins_sm = jnp.stack([
            jnp.broadcast_to(org[:, i][:, None],
                             (n_eff, n_px)).reshape(n_rays_eff)
            for i in range(3)], axis=0)               # [3, NR_eff]

        if reuse > 1 and tile_pixels:
            # cycle the drawn iteration-blocks across the frame: rays
            # [0, NR_eff) repeat `reuse` times, so iteration i trains on
            # block (i mod n_iter/reuse). z samples are drawn fresh per
            # iteration BELOW this point (full n_rays), matching the
            # reference's per-iteration depth jitter.
            #
            # tile_pixels=False (the fused path) SKIPS these tiles: the
            # pixel arrays stay at NR_eff and kernels/train_step.py
            # _prepare_batch(reuse=R) repeats them along the iteration
            # axis of the final kernel-layout operands instead —
            # bit-identical operands, ~R x less sampler/relayout work
            # (the gather, dirs math and layout chains all run at 1/R
            # size; only z stays full because it is fresh per iteration).
            tile = lambda a: jnp.tile(a, (reuse,) if a.ndim == 1
                                      else (1, reuse))  # noqa: E731
            rgb_sm, depth, state, origins_sm, dirs_sm = (
                tile(rgb_sm), tile(depth), tile(state),
                tile(origins_sm), tile(dirs_sm))

        max_bound = jnp.max(depth)
        z_sm, valid = S.sample_z_sm(k_z, depth, state, st.min_depth,
                                    max_bound, n_b2s, st.n_bins,
                                    st.surface_eps, st.stop_eps,
                                    reuse=1 if tile_pixels else reuse)
        # tile_pixels=False: pixel arrays/valid [NR_eff], z fresh [S, NR]
        return rgb_sm, depth, state, valid, z_sm, origins_sm, dirs_sm

    if keys is None:
        keys = jax.random.split(key, cap)
    rgb_sm, depth, state, valid, z_sm, origins_sm, dirs_sm = jax.vmap(
        sample_one)(keys, kf_pool_slot, kf_bbox, n_kf, latest2, obj_ids)
    if reuse > 1 and not tile_pixels:
        # untiled fused-path batch: pixel arrays cover n_frames/reuse rays,
        # z_sm is full-size; the ray-major views below would be shape-
        # inconsistent, and the fused kernel never reads them.
        return {
            "rgb_sm": rgb_sm, "depth": depth, "state": state,
            "valid": valid, "z_sm": z_sm,
            "origins_sm": origins_sm, "dirs_sm": dirs_sm,
        }
    # Production (fused-kernel) consumers read the *_sm channel/sample-
    # major keys; the legacy ray-major views below serve the XLA scan path
    # and are DCE'd under jit when unused.
    origins = jnp.moveaxis(origins_sm, 1, -1)         # [cap, NR, 3]
    dirs_w = jnp.moveaxis(dirs_sm, 1, -1)
    z = jnp.moveaxis(z_sm, 1, -1)                     # [cap, NR, S]
    return {
        "rgb_sm": rgb_sm,        # [cap, 3, NR]
        "depth": depth,          # [cap, NR]
        "state": state,
        "valid": valid,
        "z_sm": z_sm,            # [cap, S, NR]
        "origins_sm": origins_sm,
        "dirs_sm": dirs_sm,
        # legacy ray-major views (XLA scan path; jit DCEs when unused)
        "rgb": jnp.moveaxis(rgb_sm, 1, -1),
        "z": z,
        "origins": origins,
        "dirs": dirs_w,
        "pts": origins[:, :, None, :] + dirs_w[:, :, None, :] * z[..., None],
    }


def _bank_forward(flat, spec, scale, pts, st: StepStatics):
    """PE + ensemble MLP over [cap, rays, samples, 3] points; ``flat`` is
    the bank's packed parameter buffer (grads flow through it)."""
    pe, mlp_p = spec.unflatten(flat)
    if st.use_pallas_train and st.max_deg == 5:
        from vmap_tpu.kernels.ensemble import fused_field_train, prepare_params
        cap, n_rays, n_s, _ = pts.shape
        prepared = prepare_params(pe, mlp_p, scale, spec.hidden)
        interpret = jax.default_backend() != "tpu"
        # one point-tile per object: the per-iteration batch is small, so
        # grid = (cap, 1) keeps kernel-invocation count minimal; cap the
        # tile so activations ([~10h + 256, tile] f32) stay within VMEM
        m = n_rays * n_s
        tile = min(max(((m + 127) // 128) * 128, 128), 1536)
        alpha, color = fused_field_train(
            prepared, pts.reshape(cap, m, 3), spec.hidden, interpret, tile)
        return (alpha.reshape(cap, n_rays, n_s),
                color.reshape(cap, n_rays, n_s, 3))
    cdtype = jnp.bfloat16 if st.compute_dtype == "bfloat16" else None
    emb = jax.vmap(lambda p, x, s: embed(p, x, s, st.max_deg))(pe, pts, scale)
    alpha, color = jax.vmap(
        lambda p, e: mlp_apply(p, e, emb1=st.emb1, compute_dtype=cdtype))(mlp_p, emb)
    return alpha[..., 0], color


def _ray_major(batch: dict) -> dict:
    """Drop the channel/sample-major keys, keeping the legacy ray-major
    views (axis 1 = ray) that the XLA scan path slices per iteration."""
    return {k: v for k, v in batch.items() if not k.endswith("_sm")}


def _slice_iter(batch: dict, it: jax.Array, n_per: int) -> dict:
    return {k: jax.lax.dynamic_slice_in_dim(v, it * n_per, n_per, axis=1)
            for k, v in batch.items()}


def _bank_loss(flat, spec, scale, active, sl, st: StepStatics):
    alpha, color = _bank_forward(flat, spec, scale, sl["pts"], st)
    return L.step_batch_loss(
        alpha, color, sl["depth"], sl["rgb"], sl["state"], sl["valid"],
        sl["z"], active, st.color_scaling, st.opacity_scaling)


@lru_cache(maxsize=8)
def make_frame_step(st: StepStatics):
    """Build the jitted per-frame step for a static config.

    Returned callable:
        frame_step(bank_obj, bank_bg, pool_packed, pool_twc,
                   obj_tab, obj_ids, bg_tab, key)
            -> (bank_obj', bank_bg', metrics)
    where *_tab = (kf_pool_slot, bbox, n_kf, latest2); bank_bg/bg_tab are
    ignored (pass the same obj values) when st.do_bg is False.
    """
    n_frames = st.n_iter * st.win
    n_frames_bg = st.n_iter * st.win_bg
    n_per = st.win * st.n_px          # rays per obj per iteration
    n_per_bg = st.win_bg * st.n_px_bg
    assert st.n_iter % st.sample_reuse == 0, (st.n_iter, st.sample_reuse)

    if st.use_fused_frame:
        from vmap_tpu.kernels.train_step import fused_frame_prepared
        bf16 = _kernel_mm_policy(st.compute_dtype)

        # NOTE on a deleted alternative: rounds 2-3 built (twice) a merged
        # obj+bg kernel — ONE pallas_call interleaving both banks' streams,
        # chasing the measured 0.95 MXU/VPU overlap of two independent
        # chains (scripts/microbench_overlap.py). v1 (slab emission) lost
        # ~1 ms; v2 (op-granularity generator interleave + double-buffered
        # bg DMA) still lost ~0.8 ms: after the round-2/3 VPU cuts BOTH
        # kernels are MXU-bound, so there is no complementary-unit slack
        # left to hide either under the other — merging only adds the bg
        # pad-chunk overhead. Two kernels is the right schedule here; see
        # docs/round_notes.md ("merged obj+bg kernel", rounds 2-3).
        def fused_step(pb_obj, pb_bg, pool_packed, pool_twc,
                       obj_tab, obj_ids, bg_tab, key):
            k_obj, k_bg = jax.random.split(key)
            batch = _sample_bank(k_obj, pool_packed, pool_twc,
                                 *obj_tab, obj_ids,
                                 n_frames, st.n_px, st.n_b2s, st,
                                 reuse=st.sample_reuse, tile_pixels=False)
            pb_obj, losses_o = fused_frame_prepared(
                pb_obj, batch, st.n_iter, n_per, lr=st.lr, wd=st.wd,
                color_scaling=st.color_scaling,
                opacity_scaling=st.opacity_scaling, bf16=bf16,
                reuse=st.sample_reuse)
            loss = losses_o[:, -1].sum()
            loss_mean = losses_o.sum(0).mean()
            if st.do_bg:
                bg_ids = jnp.zeros((1,), jnp.int32)
                batch_bg = _sample_bank(k_bg, pool_packed, pool_twc,
                                        *bg_tab, bg_ids, n_frames_bg,
                                        st.n_px_bg, st.n_b2s_bg, st,
                                        px_block=st.px_block_bg)
                pb_bg, losses_b = fused_frame_prepared(
                    pb_bg, batch_bg, st.n_iter, n_per_bg, lr=st.lr,
                    wd=st.wd, color_scaling=st.color_scaling,
                    opacity_scaling=st.opacity_scaling, bf16=bf16)
                loss = loss + losses_b[:, -1].sum()
                loss_mean = loss_mean + losses_b.sum(0).mean()
            metrics = {"loss": loss, "loss_mean": loss_mean}
            return pb_obj, pb_bg, metrics

        # Donation knob (default OFF; VMAP_DONATE=1 re-enables). Donating
        # the prepared banks lets XLA reuse their HBM — but the entry-level
        # alias contract (output tuple element MUST occupy the donated
        # input's buffer) combined with a pallas_call that does NOT declare
        # operand-output aliasing forces XLA to COPY all six state blocks
        # (~122 MB/frame, HLO copy.312-.317 + chunked slice-start/
        # ConcatBitcast variants — scripts/inspect_hlo_copies.py) to
        # scratch before the kernel so the kernel's outputs can land in
        # the parameter buffers. Without donation the kernel reads the
        # inputs in place and writes fresh buffers: zero copies, at the
        # cost of one transient extra copy of the bank state in HBM.
        # Same-session v5e A/B (round 4): 11.85 -> 11.38 ms/frame (px4),
        # 12.83 -> 12.63 (px1), loss bit-identical. (VMAP_ALIAS=1 —
        # pallas-level in-place state — measured marginally faster still
        # but produces NaN losses on v5e hardware: in-place read-after-
        # write hazard. Do not use.)
        donate = ((0, 1) if os.environ.get("VMAP_DONATE", "0") == "1"
                  else ())

        if st.dispatch_burst > 1:
            def burst_step(pb_obj, pb_bg, pool_packed, pool_twc,
                           obj_tabs, obj_ids, bg_tabs, keys):
                """K frames in one dispatch: scan over stacked per-frame
                (obj_tab, bg_tab, key); the pool is shared (snapshots only
                reference slots live at their frame). Returns metrics
                stacked [K]."""
                def body(carry, x):
                    po, pb = carry
                    obj_tab, bg_tab, key = x
                    po, pb, metrics = fused_step(
                        po, pb, pool_packed, pool_twc, obj_tab, obj_ids,
                        bg_tab, key)
                    return (po, pb), metrics

                (pb_obj, pb_bg), ms = jax.lax.scan(
                    body, (pb_obj, pb_bg), (obj_tabs, bg_tabs, keys))
                return pb_obj, pb_bg, ms

            return jax.jit(burst_step, donate_argnums=donate)

        return jax.jit(fused_step, donate_argnums=donate)

    def frame_step(bank_obj: BankState, bank_bg: BankState | None,
                   pool_packed, pool_twc,
                   obj_tab, obj_ids, bg_tab, key):
        k_obj, k_bg = jax.random.split(key)
        batch = _ray_major(_sample_bank(k_obj, pool_packed, pool_twc,
                                        *obj_tab, obj_ids,
                                        n_frames, st.n_px, st.n_b2s, st,
                                        reuse=st.sample_reuse))
        if st.do_bg:
            bg_ids = jnp.zeros((1,), jnp.int32)  # background is instance 0
            batch_bg = _ray_major(_sample_bank(
                k_bg, pool_packed, pool_twc, *bg_tab, bg_ids,
                n_frames_bg, st.n_px_bg, st.n_b2s_bg, st,
                px_block=st.px_block_bg))
            if st.shard_data_axis:
                from jax.sharding import PartitionSpec as P
                batch_bg = jax.tree.map(
                    lambda a: jax.lax.with_sharding_constraint(
                        a, P(None, "data")), batch_bg)

        def body(carry, it):
            b_obj, b_bg = carry
            sl = _slice_iter(batch, it, n_per)

            if st.do_bg:
                sl_bg = _slice_iter(batch_bg, it, n_per_bg)

                def loss_fn(flat_o, flat_b):
                    lo, _ = _bank_loss(flat_o, b_obj.spec, b_obj.scale,
                                       b_obj.active, sl, st)
                    lb, _ = _bank_loss(flat_b, b_bg.spec, b_bg.scale,
                                       b_bg.active, sl_bg, st)
                    return lo + lb

                loss, (g_o, g_b) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(b_obj.flat, b_bg.flat)
                b_obj = apply_adamw(b_obj, g_o, st.lr, st.wd)
                b_bg = apply_adamw(b_bg, g_b, st.lr, st.wd)
            else:
                def loss_fn(flat_o):
                    lo, _ = _bank_loss(flat_o, b_obj.spec, b_obj.scale,
                                       b_obj.active, sl, st)
                    return lo

                loss, g_o = jax.value_and_grad(loss_fn)(b_obj.flat)
                b_obj = apply_adamw(b_obj, g_o, st.lr, st.wd)
            return (b_obj, b_bg), loss

        (bank_obj, bank_bg), losses = jax.lax.scan(
            body, (bank_obj, bank_bg), jnp.arange(st.n_iter))
        metrics = {"loss": losses[-1], "loss_mean": losses.mean()}
        return bank_obj, bank_bg, metrics

    return jax.jit(frame_step, donate_argnums=(0, 1))


def make_fused_step_sharded(st: StepStatics, mesh):
    """Multi-chip variant of the fused frame step: the prepared object bank
    shards over the mesh's "obj" axis (groups are independent — the Pallas
    kernel runs per device on its group shard via shard_map), the
    background bank replicates (its AdamW runs in-kernel, so its rays
    cannot data-shard; every device computes the identical bg update). The
    per-slot sampling keys are split GLOBALLY and sliced per shard, so
    every slot draws the same stream as single-device execution — losses
    match up to psum ordering.

    Requires bank capacity % (G * mesh obj size) == 0 and the mesh "data"
    axis is pure replication for this step.
    """
    from jax.sharding import PartitionSpec as P

    from vmap_tpu.kernels.train_step import fused_frame_prepared

    shard_map_fn = getattr(jax, "shard_map", None)
    rep_kw = {"check_vma": False}
    if shard_map_fn is None:  # older jax
        from jax.experimental.shard_map import shard_map as shard_map_fn
        rep_kw = {"check_rep": False}

    n_frames = st.n_iter * st.win
    n_frames_bg = st.n_iter * st.win_bg
    n_per = st.win * st.n_px
    n_per_bg = st.win_bg * st.n_px_bg
    bf16 = _kernel_mm_policy(st.compute_dtype)

    def local_step(pb_obj, pb_bg, keys, pool_packed, pool_twc,
                   obj_tab, obj_ids, bg_tab, k_bg):
        batch = _sample_bank(None, pool_packed, pool_twc, *obj_tab,
                             obj_ids, n_frames, st.n_px, st.n_b2s, st,
                             keys=keys, reuse=st.sample_reuse,
                             tile_pixels=False)
        pb_obj, losses_o = fused_frame_prepared(
            pb_obj, batch, st.n_iter, n_per, lr=st.lr, wd=st.wd,
            color_scaling=st.color_scaling,
            opacity_scaling=st.opacity_scaling, bf16=bf16,
            reuse=st.sample_reuse)
        loss = jax.lax.psum(losses_o[:, -1].sum(), "obj")
        loss_mean = jax.lax.psum(losses_o.sum(0), "obj").mean()
        if st.do_bg:
            bg_ids = jnp.zeros((1,), jnp.int32)
            batch_bg = _sample_bank(k_bg, pool_packed, pool_twc, *bg_tab,
                                    bg_ids, n_frames_bg, st.n_px_bg,
                                    st.n_b2s_bg, st,
                                    px_block=st.px_block_bg)
            pb_bg, losses_b = fused_frame_prepared(
                pb_bg, batch_bg, st.n_iter, n_per_bg, lr=st.lr, wd=st.wd,
                color_scaling=st.color_scaling,
                opacity_scaling=st.opacity_scaling, bf16=bf16)
            loss = loss + losses_b[:, -1].sum()
            loss_mean = loss_mean + losses_b.sum(0).mean()
        return pb_obj, pb_bg, {"loss": loss, "loss_mean": loss_mean}

    def spec_obj(pb):
        return jax.tree.map(lambda _: P("obj"), pb)

    def spec_rep(tree):
        return jax.tree.map(lambda _: P(), tree)

    def fused_step(pb_obj, pb_bg, pool_packed, pool_twc,
                   obj_tab, obj_ids, bg_tab, key):
        cap = obj_ids.shape[0]
        k_obj, k_bg = jax.random.split(key)
        keys = jax.random.split(k_obj, cap)        # global slot streams
        sharded = shard_map_fn(
            local_step, mesh=mesh,
            in_specs=(spec_obj(pb_obj), spec_rep(pb_bg), P("obj"),
                      P(), P(), (P("obj"),) * 4, P("obj"),
                      spec_rep(bg_tab), P()),
            out_specs=(spec_obj(pb_obj), spec_rep(pb_bg),
                       {"loss": P(), "loss_mean": P()}),
            **rep_kw)
        return sharded(pb_obj, pb_bg, keys, pool_packed, pool_twc,
                       obj_tab, obj_ids, bg_tab, k_bg)

    # same alias-contract copy tax as the single-chip path (see the
    # VMAP_DONATE note in make_frame_step) — per shard, so the same knob.
    donate = ((0, 1) if os.environ.get("VMAP_DONATE", "0") == "1" else ())
    return jax.jit(fused_step, donate_argnums=donate)


def place_prepared(mesh, pb, axis: str | None = "obj"):
    """device_put a PreparedBank with its leading (group/slot) axis sharded
    along ``axis`` (None = replicated). Multi-process safe."""
    from vmap_tpu.parallel.sharding import put_sharded
    return jax.tree.map(lambda a: put_sharded(a, mesh, axis), pb)
