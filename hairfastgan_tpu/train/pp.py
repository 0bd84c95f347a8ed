"""PostProcess (refinement) encoder training — JAX port of scripts/pp_train.py.

The most complex loop (pp_train.py:121-183):
  model(source, target) -> (S, F)
  gen_im_W = G[0..8](S)           # W-path render
  F_w      = G[0..4](S)           # feature at pair 4 (64x64)
  gen_im_F = G[5..8](S, layer_in=F [alpha-annealed mix with F_w])
  losses   = LossBuilderMulti: dice over BiSeNet-16, masked ID, multi-scale
             LPIPS face/hair, feature reconstruction, optional inpaint +
             adversarial (softplus) with discriminator/R1 steps

Default loss weights from pp_train.py's argparse (landmark/id/feat_rec/
lpips_scale/inpaint/adv).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.losses.identity import id_loss
from hairfastgan_tpu.losses.objectives import (
    adv_d_loss,
    adv_g_loss,
    dice_loss,
    dilated_mask,
    feat_recon_loss,
    r1_penalty,
)
from hairfastgan_tpu.losses.perceptual import lpips_scale
from hairfastgan_tpu.models import bisenet, encoders, stylegan2
from hairfastgan_tpu.models.stylegan2_discriminator import discriminator
from hairfastgan_tpu.ops.resample import resize
from hairfastgan_tpu.pipeline.embedding import to_res
from hairfastgan_tpu.train.common import adam_with_clip, make_train_step

Array = jax.Array


def _cast_floats(tree, dtype):
    """Cast float leaves to `dtype` (ints / Static config untouched)."""
    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, tree)


DEFAULT_WEIGHTS = {
    "landmark": 1.0, "id": 1.0, "feat_rec": 1.0,
    "lpips_scale": 1.0, "inpaint": 1.0, "adv": 0.1,
}


def _seg16_logits(frozen, img01: Array) -> Array:
    """BiSeNet-16 on the 512-downsampled [0,1] image (pp_losses.py:340-345)."""
    x = to_res(img01, 512)
    return bisenet.bisenet_logits(frozen["bisenet16"], bisenet.to_bisenet_input(x))


def _make_synth(remat: bool, cfg: HairFastConfig, dtype=jnp.float32):
    """Generator-render helper with PER-RENDER rematerialization.

    The PP losses render the frozen generator up to 3x at full resolution
    (W path, F path, feature-only path). `remat=True` wraps EACH render in
    jax.checkpoint so only the render's small inputs (S [B,18,512], F
    [B,64,64,512]) are saved and the forward is recomputed when its
    cotangent arrives.

    MEASURED INEFFECTIVE at full width (TRAIN_r04.json, v5e f32): B=2 peak
    temp 11.61 GB with remat vs 11.73 GB without, B=1 5.76 vs 5.69 GB,
    identical step time — XLA:TPU already runs its own HLO rematerialization
    pass when a program exceeds the HBM budget, so the JAX-level checkpoint
    buys nothing this toolchain hasn't done. Kept because the math is pinned
    (tests/test_losses_train.py::test_pp_remat_and_donate_match_plain) and
    other toolchains may not auto-remat. The lever that actually moves the
    full-width memory wall is `compute_dtype=jnp.bfloat16` (see `pp_loss`).
    """

    def synth(gen, s, start_layer=0, end_layer=8, layer_in=None):
        def f(gen, s, layer_in):
            # dtype must follow compute_dtype: synthesis() force-casts the
            # latent/const input to its dtype arg, so leaving the default
            # f32 here silently upcast all three full-res renders — the
            # dominant activations — and erased the bf16 temp-HBM win
            # (fused_bf16 B=2 temp 11.06 GB ≈ f32's 11.73, TRAIN_r05.json)
            return stylegan2.synthesis(gen, s, start_layer=start_layer,
                                       end_layer=end_layer, layer_in=layer_in,
                                       cfg=cfg.stylegan, dtype=dtype)

        return jax.checkpoint(f)(gen, s, layer_in) if remat \
            else f(gen, s, layer_in)

    return synth


def pp_loss(
    params,
    frozen: Dict,
    batch: Tuple[Array, ...],
    weights: Dict[str, float] = DEFAULT_WEIGHTS,
    alpha: float = 1.0,
    disc_params=None,
    cfg: HairFastConfig = HairFastConfig(),
    remat: bool = False,
    compute_dtype=None,
) -> Tuple[Array, Dict[str, Array]]:
    """batch: (source norm256, target norm256, target_mask [B,256,256,1],
    HT_E [B,256,256,1]); `alpha` anneals the F injection (pp_train.py:133-137).
    remat: per-render rematerialization (see `_make_synth`).

    compute_dtype: standard TPU mixed precision — `jnp.bfloat16` casts the
    trainable params, frozen nets, and batch to bf16 at loss entry, so every
    render/backbone activation rides bf16 while the Adam master params and
    opt state stay f32 (the per-term loss scalars are cast back to f32
    before summing). This is the lever that actually moves the full-width
    memory wall: f32 B=2 needs 16.9 GB total (OOM on 16 GB v5e,
    TRAIN_r04.json) and per-render remat doesn't help because XLA already
    remats (see `_make_synth`); halving the activation and frozen-weight
    bytes does — measured on v5e (TRAIN_r05.json): bf16 B=2 fits at
    temp 6.69 GB and steps at 0.25 s. Norm stats still fold in f32
    internally (ops/basic.py), the same bf16-weights regime the inference
    zoo runs (zoo.cast_zoo).
    """
    source, target, target_mask, ht_e = batch
    if compute_dtype is not None:
        params = _cast_floats(params, compute_dtype)
        frozen = _cast_floats(frozen, compute_dtype)
        source, target, target_mask, ht_e = (
            x.astype(compute_dtype) for x in (source, target, target_mask, ht_e))
    synth = _make_synth(remat, cfg, dtype=compute_dtype or jnp.float32)

    s, f = encoders.post_process_model(params, source, target)

    _, gen_w = synth(frozen["generator"], s)
    f_w, _ = synth(frozen["generator"], s, start_layer=0, end_layer=4)
    f_in = alpha * f + (1.0 - alpha) * jax.lax.stop_gradient(f_w)
    _, gen_f = synth(frozen["generator"], s, start_layer=5, end_layer=8,
                     layer_in=f_in)

    gen_w_256 = to_res(gen_w, 256)
    gen_f_256 = to_res(gen_f, 256)

    losses = {}

    # Dice over BiSeNet-16 probs at 256 (target path is stop-grad)
    tgt512 = jnp.clip(resize((target + 1) / 2, (512, 512), "bilinear"), 0, 1)
    seg_t = jax.lax.stop_gradient(
        resize(_seg16_logits(frozen, tgt512), (256, 256), "nearest"))
    seg_g = resize(_seg16_logits(frozen, (gen_f + 1) / 2), (256, 256), "nearest")
    losses["dice"] = weights["landmark"] * dice_loss(seg_g, seg_t)

    # masked identity
    losses["id"] = weights["id"] * (
        id_loss(frozen["id_backbone"], gen_w_256 * target_mask, source * target_mask)
        + id_loss(frozen["id_backbone"], gen_f_256 * target_mask, source * target_mask))

    # feature reconstruction (F_w detached)
    losses["feat_rec"] = weights["feat_rec"] * feat_recon_loss(
        jax.lax.stop_gradient(f_w), f)

    # multi-scale LPIPS, face + hair regions
    lp = frozen["lpips"]
    losses["lpips_face"] = 0.5 * weights["lpips_scale"] * (
        lpips_scale(lp, source * target_mask, gen_w_256 * target_mask)
        + lpips_scale(lp, source * target_mask, gen_f_256 * target_mask))
    losses["lpips_hair"] = 0.5 * weights["lpips_scale"] * (
        lpips_scale(lp, target * ht_e, gen_w_256 * ht_e)
        + lpips_scale(lp, target * ht_e, gen_f_256 * ht_e))

    # inpaint region
    if weights.get("inpaint", 0.0):
        m_inp = (1 - target_mask) * (1 - ht_e)
        smooth = dilated_mask(m_inp, 25)
        losses["inpaint"] = 0.5 * weights["inpaint"] * (
            lpips_scale(lp, target * smooth, gen_f_256 * smooth)
            + lpips_scale(lp, jax.lax.stop_gradient(gen_w_256) * smooth * (1 - ht_e),
                          gen_f_256 * smooth * (1 - ht_e)))

    if disc_params is not None:
        if compute_dtype is not None:
            disc_params = _cast_floats(disc_params, compute_dtype)
        losses["adv"] = weights["adv"] * adv_g_loss(discriminator(disc_params, gen_f))

    if compute_dtype is not None:
        # sum the per-term scalars in f32 (bf16 has ~8 bits of mantissa;
        # the gradients are unaffected — a reduce's backward broadcast is
        # exact regardless of the forward accumulation dtype)
        losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
    total = sum(losses.values())
    return total, dict(losses,
                       gen_f_256=jax.lax.stop_gradient(gen_f_256),
                       gen_w_256=jax.lax.stop_gradient(gen_w_256),
                       # full-res F render for the discriminator step
                       # (reference trains D on gen_im_F.detach(), not a
                       # 256 crop — pp_train.py:162)
                       gen_f=jax.lax.stop_gradient(gen_f))


def pp_disc_loss(disc_params, real: Array, fake: Array) -> Tuple[Array, Dict]:
    loss = adv_d_loss(discriminator(disc_params, real),
                      discriminator(disc_params, fake))
    return loss, {"disc_adv": loss}


def make_pp_split_train_step(frozen: Dict, weights=DEFAULT_WEIGHTS,
                             cfg: HairFastConfig = HairFastConfig(),
                             lr: float = 1e-4, use_adv: bool = False,
                             remat: bool = False, compute_dtype=None):
    """Segmented enc_step: the SAME update as `make_pp_train_steps`' fused
    step, computed as 3-4 smaller jitted programs plus a tiny apply program.

    Why: serving links that proxy XLA compilation cap the request body
    (the axon tunnel rejects the fused enc_step's unoptimized-HLO upload
    with HTTP 413 even at tiny config). The loss is a SUM of independent
    terms, so grad(total) = Σ grad(term-group); each group re-runs the
    shared forward (encoder + generator renders — extra FLOPs, ~2x) but
    ships a fraction of the HLO. Gradients match the fused step to float
    accumulation order (equality-tested in tests/test_losses_train.py).

    Segments: [dice | id+feat_rec | lpips(+inpaint) | adv?] + apply.
    Returns (step, tx) with the fused step's exact call/aux contract.
    """
    import optax

    tx = adam_with_clip(lr)

    synth = _make_synth(remat, cfg, dtype=compute_dtype or jnp.float32)

    def _mixed(*trees):
        """Cast float leaves to compute_dtype at segment entry (same mixed-
        precision regime as pp_loss: bf16 activations, f32 masters — grads
        flow back through the cast to the f32 params)."""
        if compute_dtype is None:
            return trees
        return tuple(_cast_floats(t, compute_dtype) for t in trees)

    def _f32(v):
        return v.astype(jnp.float32) if compute_dtype is not None else v

    def _renders(params, frozen, source, target, alpha, need_w: bool):
        s, f = encoders.post_process_model(params, source, target)
        f_w, _ = synth(frozen["generator"], s, start_layer=0, end_layer=4)
        f_in = alpha * f + (1.0 - alpha) * jax.lax.stop_gradient(f_w)
        _, gen_f = synth(frozen["generator"], s, start_layer=5, end_layer=8,
                         layer_in=f_in)
        gen_w = None
        if need_w:
            _, gen_w = synth(frozen["generator"], s)
        return s, f, f_w, gen_w, gen_f

    def seg_dice(params, frozen, source, target, target_mask, ht_e, alpha):
        params, frozen, source, target, target_mask, ht_e = _mixed(
            params, frozen, source, target, target_mask, ht_e)
        _, _, _, _, gen_f = _renders(params, frozen, source, target, alpha, False)
        tgt512 = jnp.clip(resize((target + 1) / 2, (512, 512), "bilinear"), 0, 1)
        seg_t = jax.lax.stop_gradient(
            resize(_seg16_logits(frozen, tgt512), (256, 256), "nearest"))
        seg_g = resize(_seg16_logits(frozen, (gen_f + 1) / 2),
                       (256, 256), "nearest")
        v = _f32(weights["landmark"] * dice_loss(seg_g, seg_t))
        return v, {"dice": v, "gen_f": jax.lax.stop_gradient(gen_f)}

    def seg_id_feat(params, frozen, source, target, target_mask, ht_e, alpha):
        params, frozen, source, target, target_mask, ht_e = _mixed(
            params, frozen, source, target, target_mask, ht_e)
        _, f, f_w, gen_w, gen_f = _renders(params, frozen, source, target,
                                           alpha, True)
        gen_w_256 = to_res(gen_w, 256)
        gen_f_256 = to_res(gen_f, 256)
        v_id = weights["id"] * (
            id_loss(frozen["id_backbone"], gen_w_256 * target_mask,
                    source * target_mask)
            + id_loss(frozen["id_backbone"], gen_f_256 * target_mask,
                      source * target_mask))
        v_fr = weights["feat_rec"] * feat_recon_loss(
            jax.lax.stop_gradient(f_w), f)
        v_id, v_fr = _f32(v_id), _f32(v_fr)
        return v_id + v_fr, {
            "id": v_id, "feat_rec": v_fr,
            "gen_w_256": jax.lax.stop_gradient(gen_w_256),
            "gen_f_256": jax.lax.stop_gradient(gen_f_256)}

    def seg_lpips(params, frozen, source, target, target_mask, ht_e, alpha):
        params, frozen, source, target, target_mask, ht_e = _mixed(
            params, frozen, source, target, target_mask, ht_e)
        _, _, _, gen_w, gen_f = _renders(params, frozen, source, target,
                                         alpha, True)
        gen_w_256 = to_res(gen_w, 256)
        gen_f_256 = to_res(gen_f, 256)
        lp = frozen["lpips"]
        out = {}
        out["lpips_face"] = 0.5 * weights["lpips_scale"] * (
            lpips_scale(lp, source * target_mask, gen_w_256 * target_mask)
            + lpips_scale(lp, source * target_mask, gen_f_256 * target_mask))
        out["lpips_hair"] = 0.5 * weights["lpips_scale"] * (
            lpips_scale(lp, target * ht_e, gen_w_256 * ht_e)
            + lpips_scale(lp, target * ht_e, gen_f_256 * ht_e))
        if weights.get("inpaint", 0.0):
            m_inp = (1 - target_mask) * (1 - ht_e)
            smooth = dilated_mask(m_inp, 25)
            out["inpaint"] = 0.5 * weights["inpaint"] * (
                lpips_scale(lp, target * smooth, gen_f_256 * smooth)
                + lpips_scale(lp,
                              jax.lax.stop_gradient(gen_w_256) * smooth * (1 - ht_e),
                              gen_f_256 * smooth * (1 - ht_e)))
        out = {k: _f32(v) for k, v in out.items()}
        return sum(out.values()), out

    def seg_adv(params, frozen, source, target, target_mask, ht_e, alpha,
                disc_params):
        params, frozen, source, target, target_mask, ht_e, disc_params = \
            _mixed(params, frozen, source, target, target_mask, ht_e,
                   disc_params)
        _, _, _, _, gen_f = _renders(params, frozen, source, target, alpha,
                                     False)
        v = _f32(weights["adv"] * adv_g_loss(discriminator(disc_params, gen_f)))
        return v, {"adv": v}

    # remat acts per-render inside _renders (see _make_synth) — a
    # whole-segment checkpoint would not reduce peak temp HBM
    g_dice = jax.jit(jax.value_and_grad(seg_dice, has_aux=True))
    g_idft = jax.jit(jax.value_and_grad(seg_id_feat, has_aux=True))
    g_lpip = jax.jit(jax.value_and_grad(seg_lpips, has_aux=True))
    g_adv = jax.jit(jax.value_and_grad(seg_adv, has_aux=True))

    @jax.jit
    def _apply(params, opt_state, *grads):
        g = jax.tree.map(lambda *xs: sum(xs), *grads)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, optax.global_norm(g)

    def step(params, opt_state, *batch_and_disc):
        if use_adv:
            *batch, disc_params, alpha = batch_and_disc
        else:
            *batch, alpha = batch_and_disc
            disc_params = None
        source, target, target_mask, ht_e = batch
        # frozen rides as a call-time argument (closure arrays embed as HLO
        # literals — see make_train_step; the 413 root cause)
        args = (frozen, source, target, target_mask, ht_e, alpha)
        (v1, a1), gr1 = g_dice(params, *args)
        (v2, a2), gr2 = g_idft(params, *args)
        (v3, a3), gr3 = g_lpip(params, *args)
        grads = [gr1, gr2, gr3]
        loss = v1 + v2 + v3
        aux = {**a1, **a2, **a3}
        if disc_params is not None:
            (v4, a4), gr4 = g_adv(params, *args, disc_params)
            grads.append(gr4)
            loss = loss + v4
            aux.update(a4)
        params, opt_state, gnorm = _apply(params, opt_state, *grads)
        return params, opt_state, dict(aux, loss=loss, grad_norm=gnorm)

    # expose the per-segment jitted programs (tools/pp_compile_probe.py
    # measures each one's unoptimized-HLO upload size and TPU compile)
    step.segments = {"seg_dice": g_dice, "seg_id_feat": g_idft,
                     "seg_lpips": g_lpip, "seg_adv": g_adv, "apply": _apply}
    return step, tx


def make_pp_train_steps(frozen: Dict, weights=DEFAULT_WEIGHTS,
                        cfg: HairFastConfig = HairFastConfig(),
                        lr: float = 1e-4, use_adv: bool = False,
                        remat: bool = False, donate: bool = False,
                        compute_dtype=None):
    tx = adam_with_clip(lr)

    def loss_fn(params, frozen_arg, *batch_and_disc):
        if use_adv:
            *batch, disc_params, alpha = batch_and_disc
        else:
            *batch, alpha = batch_and_disc
            disc_params = None
        losses, aux = pp_loss(params, frozen_arg, tuple(batch), weights,
                              alpha, disc_params, cfg, remat=remat,
                              compute_dtype=compute_dtype)
        return losses, aux

    # compute_dtype=jnp.bfloat16 is the full-width memory lever (see
    # pp_loss); remat is kept but measured ineffective (see _make_synth);
    # donate releases the old params/opt_state buffers to the new ones
    # (callers must thread the returned state, as real training loops do).
    # frozen is a call-time argument: closed-over weights embed as HLO
    # literals (445 MB unoptimized proto at tiny config — the axon
    # remote_compile HTTP 413 root cause; tools/pp_compile_probe.py)
    enc_step = make_train_step(loss_fn, tx, donate=donate, frozen=frozen)

    disc_step = d_tx = None
    if use_adv:
        d_tx = adam_with_clip(lr)
        disc_step = make_train_step(
            lambda p, real, fake: pp_disc_loss(p, real, fake), d_tx,
            donate=donate)

    def r1_step(disc_params, real):
        return r1_penalty(lambda p, x: discriminator(p, x), disc_params, real)

    return enc_step, disc_step, jax.jit(r1_step), tx, d_tx
