"""Training-math parity vs the ACTUAL reference code at /root/reference.

The sampler paths are covered by test_reference_parity.py; this file closes
the TRAINING side: the reference's `_sample_t` (model.py:589-619), `q_xt`
(model.py:424-587, BOTH entire-modality branches — the production
multimodal REPLACE semantics at :526-531 and the static-slice OR semantics
at :532-539), and the full `compute_loss` NELBO weighting pipeline
(model.py:797-1173 — softmin-SNR :990-993, separate txt/img loss weighting
:1036-1057, batch-ignore metric masking :1142-1143), all AST-extracted and
driven with injected uniforms shared with our pure functions.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_compat import TorchShim, add_reference_path, extract_functions
from unidisc_tpu.diffusion.forward_process import q_xt as our_q_xt
from unidisc_tpu.diffusion.forward_process import sample_t as our_sample_t
from unidisc_tpu.diffusion.loss import diffusion_loss as our_loss
from unidisc_tpu.diffusion.noise import LogLinearNoise as OurLogLinear
from unidisc_tpu.diffusion.subs import subs_parameterization

add_reference_path()

MODEL = "/root/reference/model.py"

B, TXT_L, IMG_L = 6, 8, 8
L = TXT_L + IMG_L
TEXT_V, IMG_V = 13, 11
V = TEXT_V + IMG_V
MASK = TEXT_V - 1  # reference: mask_index = text mask token
EPS = 1e-3


class _Loss:
    """Field container matching model_utils.Loss's surface (a dataclass of
    tensors) — the extracted compute_loss only constructs and returns it."""

    def __init__(self, loss, img_loss=None, txt_loss=None, nlls=None,
                 token_mask=None, txt_nlls=None, img_nlls=None,
                 extra_losses=None, modality_mask=None):
        self.loss = loss
        self.img_loss = img_loss
        self.txt_loss = txt_loss
        self.nlls = nlls
        self.token_mask = token_mask
        self.txt_nlls = txt_nlls
        self.img_nlls = img_nlls
        self.extra_losses = extra_losses
        self.modality_mask = modality_mask


def _extract_ns(rand_queue):
    return extract_functions(
        MODEL,
        ["q_xt", "_sample_t", "compute_loss", "_subs_parameterization"],
        extra_globals={
            "torch": TorchShim([], rand_queue),
            "is_xla_available": True,   # gates off visualize_samples
            "F": torch.nn.functional,
            "nn": torch.nn,
            "Loss": _Loss,
        })


def _ref_self(ns, *, multimodal, softmin_snr, text_w, img_w,
              log_separate=True, no_ce_weighting=False):
    import models.noise_schedule as ref_noise

    self = types.SimpleNamespace()
    self.noise = ref_noise.LogLinearNoise()
    self.mask_index = MASK
    self.neg_infinity = -1_000_000.0
    self.device = "cpu"
    self.dtype = torch.float32
    self.allow_slicing = False
    self.parameterization = "subs"
    self.T = 0
    self.change_of_variables = False
    self.importance_sampling = False
    self.antithetic_sampling = True
    self.sampling_eps = EPS
    self.is_compiled = True
    self.training = True
    self.backbone = types.SimpleNamespace(training=True)
    self.static_txt_sl = slice(None, TXT_L)
    self.static_img_sl = slice(TXT_L, None)
    self.config = types.SimpleNamespace(
        mode="train",
        backbone="dit",
        parameterization="subs",
        trainer=types.SimpleNamespace(
            image_mode="discrete",
            ar_shift=False,
            low_precision_loss=False,
            ar_llm_loss=False,
            multimodal_batches=multimodal,
            interleaved=False,
            mask_entire_modality=0.15,
            joint_ar_nar_prob=None,
            joint_ar_nar_timestep_warmup_steps=None,
            add_label=False,
            first_token_dropout=None,
            text_loss_weight=text_w,
            img_loss_weight=img_w,
            log_seperate_modal_losses=log_separate,
            softmin_snr=softmin_snr,
            no_ce_weighting=no_ce_weighting,
        ),
        model=types.SimpleNamespace(
            flex_attention_img_masking_prob=None,
            flex_attention_txt_masking_prob=None,
            force_argmax_valid_indices=False,
        ),
        eval=types.SimpleNamespace(),
    )
    self.get_cond_dict = lambda batch: {}
    self._maybe_sub_sample = lambda ids, am: (ids, None, am)
    self._sample_t = lambda *a, **k: ns["_sample_t"](self, *a, **k)
    self.q_xt = lambda *a, **k: ns["q_xt"](self, *a, **k)
    self._subs_parameterization = \
        lambda *a, **k: ns["_subs_parameterization"](self, *a, **k)
    return self


def _logits_table(seed):
    """Deterministic xt-dependent logits, identical in torch and JAX."""
    table = np.random.RandomState(seed).randn(V, V).astype(np.float32)

    def torch_fn(x):
        return torch.as_tensor(table)[x]

    def jax_fn(x):
        return jnp.asarray(table)[x]

    return torch_fn, jax_fn


def _make_batch(rng, all_text_row=False):
    """Clean tokens: text ids in [0, MASK) then image ids in
    [TEXT_V, V); one padding tail in the attention mask."""
    x0 = np.concatenate([
        rng.randint(0, MASK, (B, TXT_L)),
        rng.randint(TEXT_V, V, (B, IMG_L)),
    ], axis=1).astype(np.int64)
    modality = np.concatenate([
        np.zeros((B, TXT_L), np.int64), np.ones((B, IMG_L), np.int64),
    ], axis=1)
    if all_text_row:
        x0[0, TXT_L:] = rng.randint(0, MASK, (IMG_L,))
        modality[0] = 0
    attention_mask = np.ones((B, L), bool)
    attention_mask[1, -3:] = False  # padded tail on one row
    return x0, modality, attention_mask


def _draw_injected_uniforms(seed):
    """Generate the uniforms OUR functions will draw (sample_t:
    uniform(rng_t, (B,)); q_xt: split(rng_q,3) -> (B,L),(B,1),(B,1)) and
    queue them for the reference in its pop order."""
    rng_t, rng_q = jax.random.split(jax.random.PRNGKey(seed))
    u_t = np.asarray(jax.random.uniform(rng_t, (B,)))
    k_move, k_txt, k_img = jax.random.split(rng_q, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B, L)))
    u_txt = np.asarray(jax.random.uniform(k_txt, (B, 1)))
    u_img = np.asarray(jax.random.uniform(k_img, (B, 1)))
    return rng_t, rng_q, [u_t, u_move, u_txt, u_img]


def _run_ours(rng_t, rng_q, x0, modality, attention_mask, jax_fn, *,
              multimodal, softmin_snr, text_w, img_w,
              no_ce_weighting=False):
    t = our_sample_t(rng_t, B, antithetic=True, sampling_eps=EPS)
    noise = OurLogLinear()
    sigma, dsigma = noise.total(t), noise.rate(t)
    move_chance = 1 - jnp.exp(-sigma)
    corr = our_q_xt(rng_q, jnp.asarray(x0.astype(np.int32)), move_chance,
                    MASK, modality=jnp.asarray(modality.astype(np.int32)),
                    mask_entire_modality=0.15, multimodal=multimodal)
    log_probs = subs_parameterization(jax_fn(corr.xt), corr.xt, MASK)
    out = our_loss(log_probs, jnp.asarray(x0.astype(np.int32)), sigma,
                   dsigma, attention_mask=jnp.asarray(attention_mask),
                   modality=jnp.asarray(modality.astype(np.int32)),
                   batch_ignore=corr.batch_ignore,
                   softmin_snr=softmin_snr, no_ce_weighting=no_ce_weighting,
                   text_loss_weight=text_w, img_loss_weight=img_w)
    return t, corr, out


def _run_reference(ref, x0, modality, attention_mask, torch_fn):
    batch = {
        "input_ids": torch.as_tensor(x0),
        "attention_mask": torch.as_tensor(attention_mask),
        "modality": torch.as_tensor(modality),
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
        "txt_sl": torch.as_tensor(modality) == 0,
        "img_sl": torch.as_tensor(modality) == 1,
    }

    def forward(xt, cond, return_additional_loss=False, **kw):
        return ref._subs_parameterization(torch_fn(xt), xt=xt)

    ref.forward = forward
    return ref._compute_loss(batch, prefix="train")


def _wire(ns, ref):
    ref._compute_loss = lambda *a, **k: ns["compute_loss"](ref, *a, **k)
    return ref


# ---------------------------------------------------------------------------


def test_sample_t_parity_vs_reference_code():
    rng_t, _, queue = _draw_injected_uniforms(0)
    ns = _extract_ns([queue[0]])
    ref = _ref_self(ns, multimodal=True, softmin_snr=5.0,
                    text_w=1.0, img_w=0.6)
    t_ref = ns["_sample_t"](ref, B, "cpu")
    t_ours = our_sample_t(rng_t, B, antithetic=True, sampling_eps=EPS)
    np.testing.assert_allclose(np.asarray(t_ours), t_ref.numpy(), rtol=1e-6)


@pytest.mark.parametrize("multimodal", [True, False])
def test_q_xt_parity_vs_reference_code(multimodal):
    """Both entire-modality-mask branches, token-for-token: multimodal
    REPLACE (production, model.py:526-531) vs static-slice OR with the
    all-text guard (model.py:532-539)."""
    rng = np.random.RandomState(7)
    x0, modality, _ = _make_batch(rng)
    _, rng_q, queue = _draw_injected_uniforms(1)
    move_chance = np.full((B, 1), 0.5, np.float32)

    ns = _extract_ns(queue[1:])
    ref = _ref_self(ns, multimodal=multimodal, softmin_snr=5.0,
                    text_w=1.0, img_w=0.6)
    batch = {
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
        "txt_sl": torch.as_tensor(modality) == 0,
        "sample_ids": None,
    }
    xt_ref, ignore_ref, _, _, _, move_ref = ns["q_xt"](
        ref, torch.as_tensor(x0), torch.as_tensor(move_chance),
        return_ignore_batch_mask_for_metrics=True, batch=batch)

    corr = our_q_xt(rng_q, jnp.asarray(x0.astype(np.int32)),
                    jnp.asarray(move_chance), MASK,
                    modality=jnp.asarray(modality.astype(np.int32)),
                    mask_entire_modality=0.15, multimodal=multimodal)
    np.testing.assert_array_equal(np.asarray(corr.xt), xt_ref.numpy())
    np.testing.assert_array_equal(np.asarray(corr.move_indices),
                                  move_ref.numpy())
    np.testing.assert_array_equal(np.asarray(corr.batch_ignore),
                                  ignore_ref.numpy().squeeze(-1))
    # the branches genuinely differ: REPLACE erases random masking on
    # fired rows, OR keeps it — make sure this test run fired at least one
    assert ignore_ref.any(), "no modality mask fired; pick another seed"


def test_q_xt_static_text_only_guard_parity():
    """Text-only config in the static branch: batch['txt_sl'].all() rows
    suppress the image-modality mask (model.py:536) — our all-text guard
    must match on a fully-text layout (static_txt_sl spans the sequence)."""
    rng = np.random.RandomState(9)
    x0 = rng.randint(0, MASK, (B, L)).astype(np.int64)
    modality = np.zeros((B, L), np.int64)
    _, rng_q, queue = _draw_injected_uniforms(4)
    move_chance = np.full((B, 1), 0.4, np.float32)

    ns = _extract_ns(queue[1:])
    ref = _ref_self(ns, multimodal=False, softmin_snr=None,
                    text_w=None, img_w=None)
    ref.static_txt_sl = slice(None, L)
    ref.static_img_sl = slice(L, None)  # empty image span
    batch = {"txt_sl": torch.ones((B, L), dtype=torch.bool)}
    xt_ref, ignore_ref, _, _, _, move_ref = ns["q_xt"](
        ref, torch.as_tensor(x0), torch.as_tensor(move_chance),
        return_ignore_batch_mask_for_metrics=True, batch=batch)

    corr = our_q_xt(rng_q, jnp.asarray(x0.astype(np.int32)),
                    jnp.asarray(move_chance), MASK,
                    modality=jnp.asarray(modality.astype(np.int32)),
                    mask_entire_modality=0.15, multimodal=False)
    np.testing.assert_array_equal(np.asarray(corr.xt), xt_ref.numpy())
    np.testing.assert_array_equal(np.asarray(corr.batch_ignore),
                                  ignore_ref.numpy().squeeze(-1))


def test_compute_loss_parity_production_recipe():
    """Full compute_loss pipeline at the production recipe
    (large_scale_train.yaml: softmin_snr=5, txt/img weights 1.0/0.6,
    mask_entire_modality=0.15, multimodal_batches=true): t -> noise ->
    q_xt -> subs log-probs -> weighted NELBO, vs our fused loss path."""
    rng = np.random.RandomState(11)
    x0, modality, attention_mask = _make_batch(rng)
    torch_fn, jax_fn = _logits_table(5)
    # seed 12 fires BOTH a text and an image entire-modality mask, so the
    # replace semantics + batch-ignore path is actually exercised
    rng_t, rng_q, queue = _draw_injected_uniforms(12)

    ns = _extract_ns(queue)
    ref = _wire(ns, _ref_self(ns, multimodal=True, softmin_snr=5.0,
                              text_w=1.0, img_w=0.6))
    losses = _run_reference(ref, x0, modality, attention_mask, torch_fn)

    t, corr, ours = _run_ours(rng_t, rng_q, x0, modality, attention_mask,
                              jax_fn, multimodal=True, softmin_snr=5.0,
                              text_w=1.0, img_w=0.6)

    np.testing.assert_allclose(float(ours.loss), float(losses.loss),
                               rtol=2e-5)
    np.testing.assert_allclose(float(ours.txt_loss), float(losses.txt_loss),
                               rtol=2e-5)
    np.testing.assert_allclose(float(ours.img_loss), float(losses.img_loss),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ours.nlls), losses.nlls.numpy(),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.token_mask),
                                  losses.token_mask.numpy())
    assert np.asarray(corr.batch_ignore).any(), \
        "recipe path untested: no modality mask fired"


def test_compute_loss_parity_plain_nelbo():
    """No softmin / no modality weighting: the plain masked-mean NELBO
    (model.py:1071-1073) with std dsigma/expm1(sigma) weighting, static
    entire-modality branch, an all-text row exercising the guard."""
    rng = np.random.RandomState(13)
    x0, modality, attention_mask = _make_batch(rng)
    torch_fn, jax_fn = _logits_table(6)
    rng_t, rng_q, queue = _draw_injected_uniforms(3)

    ns = _extract_ns(queue)
    ref = _wire(ns, _ref_self(ns, multimodal=False, softmin_snr=None,
                              text_w=None, img_w=None, log_separate=False))
    losses = _run_reference(ref, x0, modality, attention_mask, torch_fn)

    t, corr, ours = _run_ours(rng_t, rng_q, x0, modality, attention_mask,
                              jax_fn, multimodal=False, softmin_snr=None,
                              text_w=None, img_w=None)

    np.testing.assert_allclose(float(ours.loss), float(losses.loss),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ours.nlls), losses.nlls.numpy(),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.token_mask),
                                  losses.token_mask.numpy())


def test_q_xt_interleaved_block_parity_vs_reference_code():
    """The INTERLEAVED entire-modality branch (model.py:483-522): contiguous
    (modality, sample_id) blocks of size > 4 are fully masked with
    probability mask_prob * 2 * (k+1)/K — token-for-token vs the reference
    loop with injected uniforms (per-block draws placed at our per-position
    block-start lanes)."""
    B2, L2 = 3, 20
    P = 0.4
    modality = np.zeros((B2, L2), np.int64)
    sample_ids = np.zeros((B2, L2), np.int64)
    # row0: s0 txt(6) | s0 img(8) | s1 txt(6)          -> 3 valid blocks
    modality[0, 6:14] = 1
    sample_ids[0, 14:] = 1
    # row1: s0 txt(3, too small) | s0 img(9) | pad(8)  -> 1 valid block
    modality[1, 3:12] = 1
    sample_ids[1, 12:] = -1
    # row2: s0 txt(10) | s1 img(10)                    -> 2 valid blocks
    modality[2, 10:] = 1
    sample_ids[2, 10:] = 1

    rng_np = np.random.RandomState(17)
    x0 = np.where(modality == 0,
                  rng_np.randint(0, MASK, (B2, L2)),
                  rng_np.randint(TEXT_V, V, (B2, L2))).astype(np.int64)
    move_chance = np.full((B2, 1), 0.3, np.float32)

    # our draws, replicated from the q_xt key schedule
    rng_q = jax.random.PRNGKey(5)
    k_move, k_txt, k_img = jax.random.split(rng_q, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B2, L2)))
    u_txt = np.asarray(jax.random.uniform(k_txt, (B2, 1)))
    u_img = np.asarray(jax.random.uniform(k_img, (B2, 1)))
    u_block_full = np.asarray(jax.random.uniform(
        jax.random.fold_in(rng_q, 3), (B2, L2)))

    # enumerate the reference's filtered blocks (row-major by start) and
    # lift our per-position draws onto its (M, 1) block draw
    block_starts = []
    for bb in range(B2):
        st = 0
        for p in range(1, L2 + 1):
            if p == L2 or (modality[bb, p] != modality[bb, p - 1]
                           or sample_ids[bb, p] != sample_ids[bb, p - 1]):
                if (p - st) > 4 and sample_ids[bb, st] >= 0:
                    block_starts.append((bb, st))
                st = p
    assert len(block_starts) == 6  # 3 + 1 + 2
    u_block = np.asarray([[u_block_full[bb, st]] for bb, st in block_starts],
                         np.float32)

    ns = extract_functions(
        MODEL, ["q_xt"],
        extra_globals={
            "torch": TorchShim([], [u_move, u_txt, u_img, u_block]),
            "get_contiguous_blocks_per_sample": extract_functions(
                "/root/reference/unidisc/utils/tensor_utils.py",
                ["get_contiguous_blocks_per_sample"]
            )["get_contiguous_blocks_per_sample"],
        })
    ref = _ref_self(ns, multimodal=True, softmin_snr=None, text_w=None,
                    img_w=None)
    ref.config.trainer.interleaved = True
    ref.config.trainer.mask_entire_modality = P
    batch = {
        "modality": torch.as_tensor(modality),
        "sample_ids": torch.as_tensor(sample_ids),
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
    }
    xt_ref, ignore_ref, _, _, _, move_ref = ns["q_xt"](
        ref, torch.as_tensor(x0), torch.as_tensor(move_chance),
        return_ignore_batch_mask_for_metrics=True, batch=batch)

    corr = our_q_xt(rng_q, jnp.asarray(x0.astype(np.int32)),
                    jnp.asarray(move_chance), MASK,
                    modality=jnp.asarray(modality.astype(np.int32)),
                    mask_entire_modality=P, multimodal=True,
                    sample_ids=jnp.asarray(sample_ids.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(corr.move_indices),
                                  move_ref.numpy())
    np.testing.assert_array_equal(np.asarray(corr.xt), xt_ref.numpy())
    np.testing.assert_array_equal(np.asarray(corr.batch_ignore),
                                  ignore_ref.numpy())
    assert ignore_ref.any(), "no block fired at this seed; adjust"


def test_compute_loss_parity_joint_ar_nar():
    """Joint AR+NAR loss mixing (model.py:541-551 warmup gate +
    1110-1134 per-row combine) vs our train-loss path. The reference's
    combine adds an UNDEFINED `weighted_z_loss` (model.py:1134 — a latent
    NameError whenever the path is enabled); it is injected as 0 here,
    the only runnable reading, which is also what we implement."""
    from unidisc_tpu.config import Config as OurConfig
    from unidisc_tpu.config import ModelConfig, TrainerConfig
    from unidisc_tpu.training.train_state import compute_batch_loss

    rng_np = np.random.RandomState(19)
    x0, modality, attention_mask = _make_batch(rng_np)
    torch_fn, jax_fn = _logits_table(8)

    rng = jax.random.PRNGKey(12)
    rng_t, rng_mask, _ = jax.random.split(rng, 3)
    u_t = np.asarray(jax.random.uniform(rng_t, (B,)))
    k_move, k_txt, k_img = jax.random.split(rng_mask, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B, L)))
    u_txt = np.asarray(jax.random.uniform(k_txt, (B, 1)))
    u_img = np.asarray(jax.random.uniform(k_img, (B, 1)))
    u_joint = np.asarray(jax.random.uniform(
        jax.random.fold_in(rng, 11), (B,)))

    ns = extract_functions(
        MODEL,
        ["q_xt", "_sample_t", "compute_loss", "_subs_parameterization"],
        extra_globals={
            "torch": TorchShim([], [u_t, u_move, u_txt, u_img, u_joint]),
            "is_xla_available": True,
            "F": torch.nn.functional,
            "nn": torch.nn,
            "Loss": _Loss,
            "weighted_z_loss": 0.0,  # undefined in the reference: injected
            "linear_warmup": extract_functions(
                "/root/reference/unidisc/utils/trainer_utils.py",
                ["linear_warmup"])["linear_warmup"],
        })
    ref = _wire(ns, _ref_self(ns, multimodal=True, softmin_snr=5.0,
                              text_w=None, img_w=None, log_separate=False))
    ref.config.trainer.ar_llm_loss = True
    ref.config.trainer.joint_ar_nar_prob = 0.5
    ref.config.trainer.joint_ar_nar_prob_warmup_steps = 10
    ref.config.trainer.ar_print_loss = False
    ref.global_step = 20  # past warmup: current_prob == 0.5

    batch = {
        "input_ids": torch.as_tensor(x0),
        "attention_mask": torch.as_tensor(attention_mask),
        "modality": torch.as_tensor(modality),
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
        "txt_sl": torch.as_tensor(modality) == 0,
        "img_sl": torch.as_tensor(modality) == 1,
    }

    def forward(xt, cond, return_additional_loss=False, **kw):
        logits = torch_fn(xt)
        # trainer.ar_llm_loss: forward returns (subs log-probs, raw logits)
        # (reference: model.py:755-759)
        return ref._subs_parameterization(logits, xt=xt), logits

    ref.forward = forward
    losses = ref._compute_loss(batch, prefix="train")

    def apply_fn(params, x, sigma, modality_, rng_, train, **extra):
        return jax_fn(x)

    cfg = OurConfig(
        model=ModelConfig(hidden_size=8, n_blocks=1, n_heads=1, cond_dim=8,
                          length=L, txt_length=TXT_L, img_length=IMG_L,
                          text_vocab_size=TEXT_V, image_vocab_size=IMG_V),
        trainer=TrainerConfig(softmin_snr=5.0, mask_entire_modality=0.15,
                              multimodal_batches=True, ar_llm_loss=True,
                              joint_ar_nar_prob=0.5,
                              joint_ar_nar_prob_warmup_steps=10,
                              sampling_eps=EPS))
    out = compute_batch_loss(
        cfg, apply_fn, None, rng,
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32)),
         "attention_mask": jnp.asarray(attention_mask)},
        train=True, step=jnp.asarray(20, jnp.int32))

    # coverage: the joint mask actually split the batch both ways
    joint = u_joint < 0.5
    assert joint.any() and (~joint).any()
    np.testing.assert_allclose(float(out.loss), float(losses.loss),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out.nlls), losses.nlls.numpy(),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.token_mask),
                                  losses.token_mask.numpy())


def test_ar_llm_loss_standalone_parity():
    """trainer.ar_llm_loss without joint: the final loss is the mean CE
    over MASKED positions from the raw logits (model.py:1076-1108,
    1135-1136 — it REPLACES the weighted NELBO)."""
    from unidisc_tpu.config import Config as OurConfig
    from unidisc_tpu.config import ModelConfig, TrainerConfig
    from unidisc_tpu.training.train_state import compute_batch_loss

    rng_np = np.random.RandomState(23)
    x0, modality, attention_mask = _make_batch(rng_np)
    torch_fn, jax_fn = _logits_table(14)

    rng = jax.random.PRNGKey(3)
    rng_t, rng_mask, _ = jax.random.split(rng, 3)
    u_t = np.asarray(jax.random.uniform(rng_t, (B,)))
    k_move, k_txt, k_img = jax.random.split(rng_mask, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B, L)))
    u_txt = np.asarray(jax.random.uniform(k_txt, (B, 1)))
    u_img = np.asarray(jax.random.uniform(k_img, (B, 1)))

    ns = _extract_ns([u_t, u_move, u_txt, u_img])
    ref = _wire(ns, _ref_self(ns, multimodal=True, softmin_snr=5.0,
                              text_w=None, img_w=None, log_separate=False))
    ref.config.trainer.ar_llm_loss = True
    ref.config.trainer.ar_print_loss = False

    batch = {
        "input_ids": torch.as_tensor(x0),
        "attention_mask": torch.as_tensor(attention_mask),
        "modality": torch.as_tensor(modality),
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
    }

    def forward(xt, cond, return_additional_loss=False, **kw):
        logits = torch_fn(xt)
        return ref._subs_parameterization(logits, xt=xt), logits

    ref.forward = forward
    losses = ref._compute_loss(batch, prefix="train")

    def apply_fn(params, x, sigma, modality_, rng_, train, **extra):
        return jax_fn(x)

    cfg = OurConfig(
        model=ModelConfig(hidden_size=8, n_blocks=1, n_heads=1, cond_dim=8,
                          length=L, txt_length=TXT_L, img_length=IMG_L,
                          text_vocab_size=TEXT_V, image_vocab_size=IMG_V),
        trainer=TrainerConfig(softmin_snr=5.0, mask_entire_modality=0.15,
                              multimodal_batches=True, ar_llm_loss=True,
                              sampling_eps=EPS))
    out = compute_batch_loss(
        cfg, apply_fn, None, rng,
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32)),
         "attention_mask": jnp.asarray(attention_mask)},
        train=True)
    np.testing.assert_allclose(float(out.loss), float(losses.loss),
                               rtol=2e-5)


def _ar_ref(ns, *, ar_inpainting):
    """Reference self for the AR path: parameterization='ar', ar_shift,
    real extracted forward() with a table-lookup backbone."""
    ref = _ref_self(ns, multimodal=False, softmin_snr=None,
                    text_w=None, img_w=None, log_separate=True)
    ref.parameterization = "ar"
    ref.config.parameterization = "ar"
    ref.config.trainer.ar_shift = True
    ref.config.trainer.ar_inpainting = ar_inpainting
    ref.config.trainer.rand_ar_modality_dropout = None
    ref.config.trainer.image_mode = "discrete"
    ref.config.trainer.compile = False
    ref.config.trainer.disable_forward_autocast_during_eval = False
    ref.config.trainer.force_bf16_eval = False
    ref.text_vocab_size = TEXT_V
    ref._process_sigma = lambda s: s
    ref.get_cond_dict = lambda batch: {"modality": batch["modality"]}
    ref.forward = lambda *a, **k: ns["forward"](ref, *a, **k)
    return ref


def _extract_ar_ns(rand_queue, torch_fn, xla=True):
    import contextlib

    class _Backbone:
        training = True

        def __call__(self, x, sigma, **kw):
            return torch_fn(x)

    ns = extract_functions(
        MODEL, ["q_xt", "compute_loss", "forward"],
        extra_globals={
            "torch": TorchShim([], rand_queue),
            "is_xla_available": xla,
            "F": torch.nn.functional,
            "nn": torch.nn,
            "Loss": _Loss,
            "ExitStack": contextlib.ExitStack,
            "Tensor": torch.Tensor,
        })
    return ns, _Backbone()


def _our_ar_cfg(*, ar_inpainting):
    from unidisc_tpu.config import Config as OurConfig
    from unidisc_tpu.config import ModelConfig, TrainerConfig

    return OurConfig(
        model=ModelConfig(hidden_size=8, n_blocks=1, n_heads=1, cond_dim=8,
                          length=L, txt_length=TXT_L, img_length=IMG_L,
                          text_vocab_size=TEXT_V, image_vocab_size=IMG_V),
        trainer=TrainerConfig(parameterization="ar", ar_shift=True,
                              ar_inpainting=ar_inpainting,
                              sampling_eps=EPS))


def test_ar_loss_parity_vs_reference_code():
    """Plain AR training loss through the ACTUAL extracted forward() +
    compute_loss(): ar_shift slicing in forward (model.py:737-744), mask
    -inf + log_softmax (model.py:761-782), masked-mean NLL (std_weighting=1,
    model.py:975-977, 1071-1073)."""
    from unidisc_tpu.training.train_state import compute_batch_loss

    rng_np = np.random.RandomState(29)
    x0, modality, attention_mask = _make_batch(rng_np)
    torch_fn, jax_fn = _logits_table(21)

    ns, backbone = _extract_ar_ns([], torch_fn)
    ref = _ar_ref(ns, ar_inpainting=False)
    ref.backbone = backbone

    batch = {
        "input_ids": torch.as_tensor(x0),
        "attention_mask": torch.as_tensor(attention_mask),
        "modality": torch.as_tensor(modality),
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
    }
    losses = ns["compute_loss"](ref, batch, prefix="train")

    def apply_fn(params, x, sigma, modality_, rng_, train, **extra):
        return jax_fn(x)

    out = compute_batch_loss(
        _our_ar_cfg(ar_inpainting=False), apply_fn, None,
        jax.random.PRNGKey(0),
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32)),
         "attention_mask": jnp.asarray(attention_mask)},
        train=True)
    np.testing.assert_allclose(float(out.loss), float(losses.loss),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out.nlls), losses.nlls.numpy(),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.token_mask),
                                  losses.token_mask.numpy())


def test_ar_inpainting_parity_vs_reference_code():
    """trainer.ar_inpainting (model.py:880-896): [corrupted || clean]
    doubling, antithetic per-row mask rate over the FULL (0,1) range,
    loss restricted to the clean half via attention = [zeros || ones] —
    token-for-token with injected uniforms."""
    from unidisc_tpu.training.train_state import compute_batch_loss

    rng_np = np.random.RandomState(31)
    x0, modality, attention_mask = _make_batch(rng_np)
    torch_fn, jax_fn = _logits_table(23)

    # our draw schedule: split(rng,3) -> (rng_t, rng_mask, rng_drop);
    # u_t = uniform(rng_t, (B,)); move = uniform(rng_mask, (B, 2L))
    rng = jax.random.PRNGKey(40)
    rng_t, rng_mask, _ = jax.random.split(rng, 3)
    u_t = np.asarray(jax.random.uniform(rng_t, (B,)))
    u_move = np.asarray(jax.random.uniform(rng_mask, (B, 2 * L)))

    ns, backbone = _extract_ar_ns([u_t, u_move], torch_fn)
    ref = _ar_ref(ns, ar_inpainting=True)
    ref.backbone = backbone

    batch = {
        "input_ids": torch.as_tensor(x0),
        "attention_mask": torch.as_tensor(attention_mask),
        "modality": torch.as_tensor(modality),
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
    }
    losses = ns["compute_loss"](ref, batch, prefix="train")

    def apply_fn(params, x, sigma, modality_, rng_, train, **extra):
        assert x.shape[1] == 2 * L and modality_.shape[1] == 2 * L
        return jax_fn(x)

    out = compute_batch_loss(
        _our_ar_cfg(ar_inpainting=True), apply_fn, None, rng,
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32)),
         "attention_mask": jnp.asarray(attention_mask)},
        train=True)
    np.testing.assert_allclose(float(out.loss), float(losses.loss),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out.nlls), losses.nlls.numpy(),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.token_mask),
                                  losses.token_mask.numpy())
    # coverage: the corrupted half actually received mask tokens
    t_inp = (u_t / B + np.arange(B) / B) % 1.0
    assert (u_move[:, :L] < t_inp[:, None]).any()


def test_mask_text_region_parity_vs_reference_code():
    """q_xt(mask_text_region=True) (model.py:456-466): one contiguous
    region per row bounded by the first EOS replaces the text-span mask —
    region construction parity with the reference loop given identical
    integer draws (the reference uses python random.randint; our uniform
    -derived d/start values are queued into a randint shim)."""
    from unidisc_tpu.diffusion.forward_process import mask_text_region

    rng_np = np.random.RandomState(37)
    x0, modality, _ = _make_batch(rng_np)
    EOS = MASK - 1
    # place an EOS in each row's text span (>= position 3 so the reference
    # and our clamped max_valid agree)
    eos_pos = rng_np.randint(3, TXT_L, size=B)
    for bb in range(B):
        x0[bb, eos_pos[bb]] = EOS
        # no accidental earlier EOS
        for p in range(eos_pos[bb]):
            if x0[bb, p] == EOS:
                x0[bb, p] = EOS - 1

    rng_q = jax.random.PRNGKey(15)
    k_move, _, _ = jax.random.split(rng_q, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B, L)))
    move_chance = np.full((B, 1), 0.5, np.float32)

    # replicate our integer draws (mask_text_region key schedule) in numpy
    k_region = jax.random.fold_in(rng_q, 7)
    k_d, k_s = jax.random.split(k_region)
    u_d = np.asarray(jax.random.uniform(k_d, (B,)))
    u_s = np.asarray(jax.random.uniform(k_s, (B,)))
    max_valid = eos_pos.copy()
    lo, hi = max_valid // 3, max_valid - 1
    d = np.clip((lo + u_d * (hi - lo + 1)).astype(np.int64), 1, hi)
    start = (u_s * (max_valid - d + 1)).astype(np.int64)

    class _RandintShim:
        def __init__(self, queue):
            self.queue = queue

        def randint(self, a, b):
            lo_got, hi_got, val = self.queue.pop(0)
            assert (a, b) == (lo_got, hi_got), ((a, b), (lo_got, hi_got))
            return val

    queue = []
    for bb in range(B):
        queue.append((int(lo[bb]), int(hi[bb]), int(d[bb])))
        queue.append((0, int(max_valid[bb] - d[bb]), int(start[bb])))

    ns = extract_functions(
        MODEL, ["q_xt"],
        extra_globals={
            "torch": TorchShim([], [u_move]),
            "random": _RandintShim(queue),
        })
    ref = _ref_self(ns, multimodal=False, softmin_snr=None, text_w=None,
                    img_w=None)
    ref.backbone.training = False  # eval path: no entire-modality masking
    ref.config.trainer.mask_entire_modality = None
    ref.tokenizer = types.SimpleNamespace(eos_token_id=EOS)
    xt_ref = ns["q_xt"](ref, torch.as_tensor(x0),
                        torch.as_tensor(move_chance),
                        mask_text_region=True)
    assert not queue, "reference did not consume all injected draws"

    move = jax.random.uniform(k_move, (B, L)) < 0.5
    move_ours = mask_text_region(k_region, move,
                                 jnp.asarray(x0.astype(np.int32)),
                                 TXT_L, EOS)
    xt_ours = jnp.where(move_ours, MASK, jnp.asarray(x0.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(xt_ours), xt_ref.numpy())


def test_q_xt_add_label_first_token_dropout_parity():
    """q_xt with trainer.add_label + first_token_dropout (model.py:553-563):
    position 0 (the label token) is never corrupted, then re-masked with
    prob p for label-CFG — token-for-token vs the extracted reference with
    injected uniforms."""
    rng_np = np.random.RandomState(41)
    x0, modality, _ = _make_batch(rng_np)
    move_chance = np.full((B, 1), 0.9, np.float32)  # high: pos 0 usually hit

    rng_q = jax.random.PRNGKey(33)
    k_move, _, _ = jax.random.split(rng_q, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B, L)))
    u_drop = np.asarray(jax.random.uniform(
        jax.random.fold_in(rng_q, 5), (B,)))

    ns = _extract_ns([u_move, u_drop])
    ref = _ref_self(ns, multimodal=True, softmin_snr=None, text_w=None,
                    img_w=None)
    ref.config.trainer.mask_entire_modality = None
    ref.config.trainer.add_label = True
    ref.config.trainer.first_token_dropout = 0.3
    xt_ref, ignore_ref, _, _, _, move_ref = ns["q_xt"](
        ref, torch.as_tensor(x0), torch.as_tensor(move_chance),
        return_ignore_batch_mask_for_metrics=True, batch={})

    corr = our_q_xt(rng_q, jnp.asarray(x0.astype(np.int32)),
                    jnp.asarray(move_chance), MASK,
                    modality=jnp.asarray(modality.astype(np.int32)),
                    mask_entire_modality=None, protect_first=True,
                    first_token_dropout=0.3)
    np.testing.assert_array_equal(np.asarray(corr.move_indices),
                                  move_ref.numpy())
    np.testing.assert_array_equal(np.asarray(corr.xt), xt_ref.numpy())
    np.testing.assert_array_equal(np.asarray(corr.batch_ignore),
                                  ignore_ref.numpy())
    # coverage: both a protected and a dropped row exist at this seed
    assert (u_drop < 0.3).any() and (u_drop >= 0.3).any()
    keep = u_drop >= 0.3
    assert not np.asarray(corr.move_indices)[keep, 0].any()


def test_change_of_variables_parity_vs_reference_code():
    """trainer.change_of_variables (model.py:850-857 + 969-970):
    conditioning on t, log-space move_chance interpolation, and the
    CONSTANT per-token loss weight log1p(-exp(-sigma_min)). The reference
    returns the raw per-token tensor early, bypassing its Loss plumbing —
    compared here against our per-token nlls and their masked mean."""
    import math

    from unidisc_tpu.config import Config as OurConfig
    from unidisc_tpu.config import ModelConfig, TrainerConfig
    from unidisc_tpu.training.train_state import compute_batch_loss

    rng_np = np.random.RandomState(43)
    x0, modality, attention_mask = _make_batch(rng_np)
    torch_fn, jax_fn = _logits_table(27)

    rng = jax.random.PRNGKey(50)
    rng_t, rng_mask, _ = jax.random.split(rng, 3)
    u_t = np.asarray(jax.random.uniform(rng_t, (B,)))
    k_move, _, _ = jax.random.split(rng_mask, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B, L)))

    ns = _extract_ns([u_t, u_move])
    ref = _wire(ns, _ref_self(ns, multimodal=False, softmin_snr=None,
                              text_w=None, img_w=None, log_separate=False))
    ref.change_of_variables = True
    ref.config.trainer.mask_entire_modality = None
    per_token_ref = _run_reference(ref, x0, modality, attention_mask,
                                   torch_fn)
    assert torch.is_tensor(per_token_ref) and per_token_ref.shape == (B, L)

    def apply_fn(params, x, sigma, modality_, rng_, train, **extra):
        # conditioning must be t itself under change_of_variables
        return jax_fn(x)

    cfg = OurConfig(
        model=ModelConfig(hidden_size=8, n_blocks=1, n_heads=1, cond_dim=8,
                          length=L, txt_length=TXT_L, img_length=IMG_L,
                          text_vocab_size=TEXT_V, image_vocab_size=IMG_V),
        trainer=TrainerConfig(change_of_variables=True, sampling_eps=EPS,
                              mask_entire_modality=None))
    out = compute_batch_loss(
        cfg, apply_fn, None, rng,
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32)),
         "attention_mask": jnp.asarray(attention_mask)},
        train=True)

    mask_np = attention_mask
    np.testing.assert_allclose(
        np.asarray(out.nlls), per_token_ref.numpy() * mask_np,
        rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(out.loss),
        float((per_token_ref.numpy() * mask_np).sum() / mask_np.sum()),
        rtol=2e-5)
    # the constant weight really is log1p(-exp(-sigma_min))
    c = math.log1p(-math.exp(-EPS))
    assert (np.asarray(out.nlls)[mask_np] != 0).any()
    assert np.all(np.sign(np.asarray(out.nlls)[mask_np]) >= 0) or c < 0


def test_q_xt_uniform_mode_parity_vs_reference_code():
    """discrete_diffusion_mode='uniform' (model.py:567-578): corrupted
    positions get random in-vocab tokens, modality-restricted under
    force_argmax_valid_indices — token-for-token with injected randints.
    (The reference's non-force_argmax branch reads an UNDEFINED bare
    `vocab_size` — a latent NameError; it is injected as self.vocab_size,
    the only runnable reading, which is what we implement.)"""
    rng_np = np.random.RandomState(47)
    x0, modality, _ = _make_batch(rng_np)
    move_chance = np.full((B, 1), 0.6, np.float32)

    rng_q = jax.random.PRNGKey(60)
    k_move, _, _ = jax.random.split(rng_q, 3)
    u_move = np.asarray(jax.random.uniform(k_move, (B, L)))
    k_rand = jax.random.fold_in(rng_q, 9)

    # --- force_argmax branch: modality-restricted draws ---
    k_t, k_i = jax.random.split(k_rand)
    txt_rand = np.asarray(jax.random.randint(k_t, (B, L), 0, TEXT_V - 1))
    img_rand = np.asarray(jax.random.randint(k_i, (B, L), TEXT_V, V))
    ns = extract_functions(
        MODEL, ["q_xt"],
        extra_globals={"torch": TorchShim(
            [], [u_move],
            int_queue=[(0, TEXT_V - 1, txt_rand), (TEXT_V, V, img_rand)])})
    ref = _ref_self(ns, multimodal=False, softmin_snr=None, text_w=None,
                    img_w=None)
    ref.config.trainer.mask_entire_modality = None
    ref.config.trainer.discrete_diffusion_mode = "uniform"
    ref.config.model.force_argmax_valid_indices = True
    ref.text_vocab_size = TEXT_V
    ref.vocab_size = V
    batch = {"modality_mask": torch.stack(
        [torch.as_tensor(modality) == 0,
         torch.as_tensor(modality) == 1], dim=-1)}
    xt_ref = ns["q_xt"](ref, torch.as_tensor(x0),
                        torch.as_tensor(move_chance), batch=batch)

    corr = our_q_xt(rng_q, jnp.asarray(x0.astype(np.int32)),
                    jnp.asarray(move_chance), MASK,
                    modality=jnp.asarray(modality.astype(np.int32)),
                    diffusion_mode="uniform", text_vocab_size=TEXT_V,
                    vocab_size=V)
    np.testing.assert_array_equal(np.asarray(corr.xt), xt_ref.numpy())
    assert not (np.asarray(corr.xt) == MASK).any()
    assert (np.asarray(corr.xt) != x0).any()

    # --- full-vocab branch (vocab_size injected) ---
    full_rand = np.asarray(jax.random.randint(k_rand, (B, L), 0, V))
    ns2 = extract_functions(
        MODEL, ["q_xt"],
        extra_globals={"torch": TorchShim(
            [], [u_move], int_queue=[(0, V, full_rand)]),
            "vocab_size": V})
    ref2 = _ref_self(ns2, multimodal=False, softmin_snr=None, text_w=None,
                     img_w=None)
    ref2.config.trainer.mask_entire_modality = None
    ref2.config.trainer.discrete_diffusion_mode = "uniform"
    xt_ref2 = ns2["q_xt"](ref2, torch.as_tensor(x0),
                          torch.as_tensor(move_chance))
    corr2 = our_q_xt(rng_q, jnp.asarray(x0.astype(np.int32)),
                     jnp.asarray(move_chance), MASK,
                     diffusion_mode="uniform", vocab_size=V)
    np.testing.assert_array_equal(np.asarray(corr2.xt), xt_ref2.numpy())


def test_rand_ar_modality_dropout_parity_vs_reference_code():
    """trainer.rand_ar_modality_dropout (model.py:897-907): with prob p
    per row, the row's FIRST modality is masked out and dropped from
    attention — the AR analog of CFG-unconditional training. Extracted
    with is_xla_available=False (the branch asserts it) and injected
    uniforms."""
    from unidisc_tpu.training.train_state import compute_batch_loss

    rng_np = np.random.RandomState(53)
    x0, modality, attention_mask = _make_batch(rng_np)
    torch_fn, jax_fn = _logits_table(31)

    rng = jax.random.PRNGKey(70)
    u_drop = np.asarray(jax.random.uniform(
        jax.random.fold_in(rng, 17), (B,)))

    ns, backbone = _extract_ar_ns([u_drop], torch_fn, xla=False)
    ref = _ar_ref(ns, ar_inpainting=False)
    ref.config.trainer.rand_ar_modality_dropout = 0.5
    ref.current_run_fwd_bwd_pass = 1  # skip visualize_samples gate
    ref.backbone = backbone

    batch = {
        "input_ids": torch.as_tensor(x0),
        "attention_mask": torch.as_tensor(attention_mask),
        "modality": torch.as_tensor(modality),
        "modality_mask": torch.stack(
            [torch.as_tensor(modality) == 0,
             torch.as_tensor(modality) == 1], dim=-1),
    }
    losses = ns["compute_loss"](ref, batch, prefix="train")

    def apply_fn(params, x, sigma, modality_, rng_, train, **extra):
        return jax_fn(x)

    cfg = _our_ar_cfg(ar_inpainting=False)
    from dataclasses import replace as _replace
    cfg = _replace(cfg, trainer=_replace(cfg.trainer,
                                         rand_ar_modality_dropout=0.5))
    out = compute_batch_loss(
        cfg, apply_fn, None, rng,
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32)),
         "attention_mask": jnp.asarray(attention_mask)},
        train=True)
    assert (u_drop < 0.5).any() and (u_drop >= 0.5).any()
    np.testing.assert_allclose(float(out.loss), float(losses.loss),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out.nlls), losses.nlls.numpy(),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.token_mask),
                                  losses.token_mask.numpy())


def test_rand_flip_ar_prob_flips_batch():
    """trainer.rand_flip_ar_prob (model.py:352-370): per-row
    [txt|img] -> [img|txt] reorder. With p=1 every row flips, so the loss
    must equal the unflipped path fed a pre-flipped batch (the flip draw
    uses its own fold_in key, leaving all other draws unchanged)."""
    from dataclasses import replace as _replace

    from unidisc_tpu.training.train_state import compute_batch_loss

    rng_np = np.random.RandomState(59)
    x0, modality, attention_mask = _make_batch(rng_np)
    _, jax_fn = _logits_table(33)

    def apply_fn(params, x, sigma, modality_, rng_, train, **extra):
        return jax_fn(x)

    rng = jax.random.PRNGKey(80)
    cfg = _our_ar_cfg(ar_inpainting=False)
    cfg_flip = _replace(cfg, trainer=_replace(cfg.trainer,
                                              rand_flip_ar_prob=1.0))

    out_flip = compute_batch_loss(
        cfg_flip, apply_fn, None, rng,
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32)),
         "attention_mask": jnp.asarray(attention_mask)},
        train=True)

    flipped = {
        "input_ids": jnp.asarray(np.concatenate(
            [x0[:, TXT_L:], x0[:, :TXT_L]], 1).astype(np.int32)),
        "modality": jnp.asarray(np.concatenate(
            [modality[:, TXT_L:], modality[:, :TXT_L]], 1).astype(np.int32)),
        "attention_mask": jnp.asarray(np.concatenate(
            [attention_mask[:, TXT_L:], attention_mask[:, :TXT_L]], 1)),
    }
    out_pre = compute_batch_loss(cfg, apply_fn, None, rng, flipped,
                                 train=True)
    np.testing.assert_allclose(float(out_flip.loss), float(out_pre.loss),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_flip.nlls),
                               np.asarray(out_pre.nlls), rtol=1e-6)


MODEL_EVAL = "/root/reference/model_eval.py"


@pytest.mark.parametrize("cfg_w,unweighed,do_uncond", [
    (None, False, False), (2.0, False, False), (None, True, True)])
def test_zero_shot_similarity_parity_vs_reference_code(cfg_w, unweighed,
                                                       do_uncond):
    """The zero-shot similarity scorer (get_similarity, nested inside
    zero_shot_eval_step model_eval.py:268-340): interior t-grid, q_xt
    corruption, conditioning clamp, optional annealed CFG combine
    (cfg(), model_eval.py:2630-2640), pad/cond zeroing, std weighting,
    per-row normalization, mean over timesteps — value-for-value with
    injected uniforms. (The reference site unpacks q_xt into FIVE names
    while q_xt returns six values — a latent ValueError; the harness
    q_xt wrapper returns the first five, the only runnable reading.)"""
    from unidisc_tpu.eval.harness import zero_shot_similarity
    from unidisc_tpu.config import Config as OurConfig
    from unidisc_tpu.config import (ModelConfig, SamplingConfig,
                                    TrainerConfig)

    STEPS = 4
    PAD = 2
    rng_np = np.random.RandomState(61)
    x0, modality, _ = _make_batch(rng_np)
    x0[1, TXT_L - 2:TXT_L] = PAD  # a padded text tail on one row
    torch_fn, jax_fn = _logits_table(35)

    rng = jax.random.PRNGKey(90)
    u_moves = []
    for i in range(STEPS):
        k_move, _, _ = jax.random.split(jax.random.fold_in(rng, i), 3)
        u_moves.append(np.asarray(jax.random.uniform(k_move, (B, L))))

    ns = extract_functions(
        MODEL_EVAL, ["get_similarity", "cfg"],
        extra_globals={"torch": TorchShim([], list(u_moves))})
    ns_model = extract_functions(
        MODEL, ["q_xt", "_subs_parameterization"],
        extra_globals={"torch": TorchShim([], list(u_moves))})

    ref = _ref_self(ns_model, multimodal=False, softmin_snr=None,
                    text_w=None, img_w=None)
    ref.backbone.training = False
    ref.config.trainer.mask_entire_modality = None
    ref.config.model.txt_length = TXT_L
    ref.config.model.img_length = IMG_L
    ref.config.sampling = types.SimpleNamespace(steps=STEPS)
    ref.config.eval = types.SimpleNamespace(cfg=cfg_w)
    ref.tokenizer = types.SimpleNamespace(pad_token_id=PAD)
    ref.parameterization = "subs"

    def q_xt5(*a, **k):
        return ns_model["q_xt"](ref, *a, **k)[:5]

    ref.q_xt = q_xt5

    def forward(x, cond, return_additional_loss=False, batch=None,
                x_img_emb=None, joint_ar_nar_mask=None, modality=None,
                return_logits=False):
        logits = torch_fn(x)
        if return_logits:
            return logits
        return ns_model["_subs_parameterization"](ref, logits, xt=x)

    ref.forward = forward
    ns["self"] = ref

    batch = {"modality": torch.as_tensor(modality)}
    sim_ref = ns["get_similarity"](
        torch.as_tensor(x0), batch, txt_cond=True,
        return_unweighed=unweighed, do_unconditional=do_uncond)

    def apply_fn(params, x, sigma, modality_):
        return jax_fn(x)

    cfg = OurConfig(
        model=ModelConfig(hidden_size=8, n_blocks=1, n_heads=1, cond_dim=8,
                          length=L, txt_length=TXT_L, img_length=IMG_L,
                          text_vocab_size=TEXT_V, image_vocab_size=IMG_V),
        trainer=TrainerConfig(sampling_eps=EPS),
        sampling=SamplingConfig(steps=STEPS))
    sim_ours = zero_shot_similarity(
        cfg, apply_fn, None,
        {"input_ids": jnp.asarray(x0.astype(np.int32)),
         "modality": jnp.asarray(modality.astype(np.int32))},
        rng, cfg_w=cfg_w, unweighed=unweighed, do_unconditional=do_uncond,
        pad_id=PAD)
    np.testing.assert_allclose(np.asarray(sim_ours), sim_ref.numpy(),
                               rtol=2e-4, atol=1e-6)


def test_compute_loss_parity_no_ce_weighting():
    """trainer.no_ce_weighting (model.py:972/989): constant per-token CE
    weight — std_weighting = 1 AND the softmin-SNR override is skipped
    even when softmin_snr is set."""
    rng = np.random.RandomState(17)
    x0, modality, attention_mask = _make_batch(rng)
    torch_fn, jax_fn = _logits_table(9)
    rng_t, rng_q, queue = _draw_injected_uniforms(7)

    ns = _extract_ns(queue)
    ref = _wire(ns, _ref_self(ns, multimodal=False, softmin_snr=5.0,
                              text_w=None, img_w=None, log_separate=False,
                              no_ce_weighting=True))
    losses = _run_reference(ref, x0, modality, attention_mask, torch_fn)

    t, corr, ours = _run_ours(rng_t, rng_q, x0, modality, attention_mask,
                              jax_fn, multimodal=False, softmin_snr=5.0,
                              text_w=None, img_w=None, no_ce_weighting=True)

    np.testing.assert_allclose(float(ours.loss), float(losses.loss),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ours.nlls), losses.nlls.numpy(),
                               rtol=2e-4, atol=1e-6)
