"""Parity tests against the ACTUAL reference code at /root/reference.

Unlike the builder-authored mirrors in test_parity_harness.py / test_port.py,
these tests import and execute the reference's own source:

  * noise schedules:      /root/reference/models/noise_schedule.py (imported)
  * DIT logits:           /root/reference/models/dit_orig.py:324 (imported,
                          flash_attn/omegaconf stubbed via reference_compat)
  * AR logits:            /root/reference/models/autoregressive_orig.py:322
  * sampler updates:      model_eval.py _ddpm_update:2042 /
                          _maskgit_update:3045 / adap_sche:2964 /
                          get_cfg_weight:1737 / _ddpm_forward:1761 and
                          model.py _subs_parameterization:621 — AST-extracted
                          and exec'd, driven token-for-token with injected
                          noise shared with our samplers.

If any reading of the reference math drifted, these fail.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_compat import (NumpyShim, TorchShim, add_reference_path,
                              extract_functions, install_torch_stubs)
from unidisc_tpu.config import Config, ModelConfig
from unidisc_tpu.diffusion import noise as our_noise
from unidisc_tpu.diffusion.subs import subs_parameterization
from unidisc_tpu.models.dit import DIT
from unidisc_tpu.models.port import port_dit_state_dict
from unidisc_tpu.sampling.sampler import adaptive_schedule, build_sampler

add_reference_path()

MODEL_EVAL = "/root/reference/model_eval.py"
MODEL = "/root/reference/model.py"


# ---------------------------------------------------------------------------
# 1. Noise schedules vs the imported reference module
# ---------------------------------------------------------------------------

def test_noise_schedule_parity_vs_reference_module():
    import models.noise_schedule as ref_ns

    t_np = np.linspace(0.01, 0.99, 23).astype(np.float32)
    t_pt = torch.tensor(t_np)
    t_jx = jnp.asarray(t_np)

    pairs = [
        (ref_ns.LogLinearNoise(), our_noise.LogLinearNoise()),
        (ref_ns.CosineNoise(), our_noise.CosineNoise()),
        (ref_ns.CosineSqrNoise(), our_noise.CosineSqrNoise()),
        (ref_ns.Linear(0.1, 10.0), our_noise.LinearNoise(0.1, 10.0)),
        (ref_ns.GeometricNoise(1e-3, 1.0), our_noise.GeometricNoise(1e-3, 1.0)),
    ]
    for ref, ours in pairs:
        ref_total, ref_rate = ref(t_pt)
        np.testing.assert_allclose(np.asarray(ours.total(t_jx)),
                                   ref_total.numpy(), rtol=1e-5, atol=1e-6,
                                   err_msg=f"total: {type(ref).__name__}")
        ref_rate = np.broadcast_to(np.asarray(ref_rate), t_np.shape)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(ours.rate(t_jx)), t_np.shape),
            ref_rate, rtol=1e-5, atol=1e-6,
            err_msg=f"rate: {type(ref).__name__}")

    # importance-sampling transformation (loglinear + linear)
    for ref, ours in (pairs[0], pairs[3]):
        np.testing.assert_allclose(
            np.asarray(ours.importance_sampling_transformation(t_jx)),
            ref.importance_sampling_transformation(t_pt).numpy(),
            rtol=1e-5, atol=1e-6,
            err_msg=f"importance: {type(ref).__name__}")


# ---------------------------------------------------------------------------
# 2. DIT / AR backbone logits vs the imported reference modules
# ---------------------------------------------------------------------------

B, L, V = 2, 16, 32
HID, HEADS, BLOCKS = 64, 4, 2


def _ref_model_config():
    return types.SimpleNamespace(model=types.SimpleNamespace(
        hidden_size=HID, cond_dim=HID, n_heads=HEADS, n_blocks=BLOCKS,
        dropout=0.0, scale_by_sigma=False))


def _our_model_config(**over):
    return ModelConfig(
        name="parity", hidden_size=HID, cond_dim=HID, n_blocks=BLOCKS,
        n_heads=HEADS, dropout=0.0, length=L, txt_length=L, img_length=0,
        text_vocab_size=V, image_vocab_size=0, norm_type="layernorm",
        qk_norm=False, sandwich_normalization=False, modality_embed=False,
        rope_2d=False, attn_backend="xla", **over)


def test_dit_orig_logits_parity():
    """Our Flax DIT vs the reference's frozen dit_orig.DIT
    (reference: models/dit_orig.py:324) at ported weights."""
    install_torch_stubs()
    import models.dit_orig as dit_orig

    torch.manual_seed(0)
    ref = dit_orig.DIT(_ref_model_config(), vocab_size=V)
    ref.eval()

    cfg = _our_model_config(time_conditioning=True)
    model = DIT(cfg, compute_dtype=jnp.float32)
    rng = np.random.RandomState(1)
    indices = rng.randint(0, V, (B, L)).astype(np.int32)
    sigma = rng.rand(B).astype(np.float32)

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(indices), jnp.asarray(sigma))["params"]
    params = port_dit_state_dict(
        params, {k: v.numpy() for k, v in ref.state_dict().items()})

    with torch.no_grad():
        ref_logits = ref(torch.tensor(indices, dtype=torch.long),
                         torch.tensor(sigma)).numpy()
    our_logits = np.asarray(model.apply(
        {"params": params}, jnp.asarray(indices), jnp.asarray(sigma)))

    np.testing.assert_allclose(our_logits, ref_logits, atol=5e-4, rtol=1e-3)


def test_ar_orig_logprobs_parity():
    """Our causal DIT vs the reference's frozen autoregressive_orig.AR
    (reference: models/autoregressive_orig.py:322) at ported weights."""
    install_torch_stubs()
    import models.autoregressive_orig as ar_orig

    mask_index = V - 1
    torch.manual_seed(0)
    ref = ar_orig.AR(_ref_model_config(), vocab_size=V,
                     mask_index=mask_index, causal=True)
    ref.eval()

    cfg = _our_model_config(time_conditioning=False, full_attention=False)
    model = DIT(cfg, compute_dtype=jnp.float32)
    rng = np.random.RandomState(2)
    indices = rng.randint(0, V, (B, L)).astype(np.int32)
    sigma = np.zeros((B,), np.float32)

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(indices), jnp.asarray(sigma))["params"]
    params = port_dit_state_dict(
        params, {k: v.numpy() for k, v in ref.state_dict().items()})

    with torch.no_grad():
        ref_logp = ref(torch.tensor(indices, dtype=torch.long),
                       torch.tensor(sigma)).numpy()
    raw = np.array(model.apply(
        {"params": params}, jnp.asarray(indices), jnp.asarray(sigma)))
    # reference AR postprocessing: logits[mask] = -1000 then log_softmax
    raw[..., mask_index] = -1000.0
    our_logp = np.asarray(jax.nn.log_softmax(jnp.asarray(raw), axis=-1))

    np.testing.assert_allclose(our_logp, ref_logp, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# 3. Sampler update math: extracted reference functions, shared noise
# ---------------------------------------------------------------------------

SB, SL, SV = 2, 10, 12
SMASK = SV - 1
STEPS = 5
EPS = 1e-5


def _extract_eval_ns(exp_queue, gumbel_queue, rand_queue=None,
                     torch_gumbel_queue=None):
    """Exec the reference sampler functions with injectable RNG shims."""

    def injected_sample_categorical(probs):
        exp = torch.as_tensor(exp_queue.pop(0),
                              dtype=probs.dtype).reshape(probs.shape)
        return (probs / exp).argmax(-1)

    ns = extract_functions(
        MODEL_EVAL,
        ["_ddpm_update", "_ddpm_caching_update", "_maskgit_update",
         "_maskgit_nucleus_update", "_first_hitting_update", "adap_sche",
         "get_cfg_weight", "_ddpm_forward", "nucleus_sampling",
         "nucleus_sampling_batch", "_ar_sampler",
         "_ddpm_update_finetune_controlled_tweedie"],
        extra_globals={
            "_sample_categorical": injected_sample_categorical,
            "torch": TorchShim(exp_queue, rand_queue, torch_gumbel_queue),
            "np": NumpyShim(gumbel_queue),
            "get_interleaved_block_mask": None,
            # tweedie scores r(E[x0|xt]) on DECODED images; the parity test
            # folds the decode into the reward stub, so the latent decode
            # is identity here (model_eval.py:3232)
            "decode_latents": lambda config, vae, ids: ids,
        })
    # extracted into ITS OWN namespace — updating ns wholesale would
    # overwrite the torch/np shims in the already-exec'd functions' globals
    sub_ns = extract_functions(MODEL, ["_subs_parameterization"])
    ns["_subs_parameterization"] = sub_ns["_subs_parameterization"]
    return ns


def _make_ref_self(ns, *, cfg_w=None, force_argmax=False,
                   multimodal=False, text_vocab_size=None):
    import models.noise_schedule as ref_ns

    self = types.SimpleNamespace()
    self.noise = ref_ns.LogLinearNoise()
    self.mask_index = SMASK
    self.neg_infinity = -1_000_000.0
    self.device = "cpu"
    self.allow_slicing = False
    self.parameterization = "subs"
    self.text_vocab_size = text_vocab_size
    self.config = types.SimpleNamespace(
        noise=types.SimpleNamespace(type="loglinear"),
        trainer=types.SimpleNamespace(
            force_bf16_eval=False, ar_shift=False,
            interleaved_training_flex_attention=False,
            multimodal_batches=multimodal),
        eval=types.SimpleNamespace(cfg=cfg_w, maskgit_r_temp=10.0),
        model=types.SimpleNamespace(
            force_argmax_valid_indices=force_argmax),
    )
    self._subs_parameterization = \
        lambda *a, **k: ns["_subs_parameterization"](self, *a, **k)
    self.get_cfg_weight = lambda *a, **k: ns["get_cfg_weight"](self, *a, **k)
    self._ddpm_forward = lambda *a, **k: ns["_ddpm_forward"](self, *a, **k)
    return self


def _fixed_logits_fn(seed):
    """Deterministic full-sequence-dependent logits, identical in torch/JAX:
    logits[b,l] = E[x[b,l]] + 0.25 * mean_l' E[x[b,l']]."""
    table = np.random.RandomState(seed).randn(SV, SV).astype(np.float32) * 2

    def torch_fn(x):
        e = torch.as_tensor(table)[x]                       # (B, L, V)
        return e + 0.25 * e.mean(dim=1, keepdim=True)

    def jax_fn(params, x, sigma, modality):
        e = jnp.asarray(table)[x]
        return e + 0.25 * e.mean(axis=1, keepdims=True)

    return torch_fn, jax_fn


def _attach_forward(self, torch_fn):
    def forward(x=None, sigma=None, return_logits=False, **kw):
        logits = torch_fn(x)
        if return_logits:
            return logits
        return self._subs_parameterization(logits, xt=x)
    self.forward = forward


def _our_sampler(predictor, jax_fn, cfg_w=None, steps=STEPS):
    cfg = Config.make("tiny").override(**{
        "model.length": SL, "model.txt_length": SL, "model.img_length": 0,
        "model.text_vocab_size": SV, "model.image_vocab_size": 0,
        "sampling.predictor": predictor, "sampling.steps": steps,
        "sampling.cfg": cfg_w, "sampling.noise_removal": False})
    return jax.jit(build_sampler(jax_fn, cfg, inject_noise=True))


def _run_reference_ddpm(self, ns, x0, x0_unmask, steps=STEPS):
    x = torch.full((SB, SL), SMASK, dtype=torch.long)
    if x0_unmask is not None:
        x = torch.where(x0_unmask, x0, x)
    timesteps = torch.linspace(1, EPS, steps + 1)
    dt = (1 - EPS) / steps
    kwargs = {}
    if x0_unmask is not None:
        kwargs = dict(x0=x0, x0_unmask=x0_unmask)
    for i in range(steps):
        t = timesteps[i] * torch.ones(SB, 1)
        x, _ = ns["_ddpm_update"](self, x, t, dt, **kwargs)
        if x0_unmask is not None:
            x = torch.where(x0_unmask, x0, x)
    return x.numpy()


def test_ddpm_token_parity_vs_reference_code():
    rng = np.random.RandomState(0)
    exp = rng.exponential(size=(STEPS, SB, SL, SV)).astype(np.float32) + 1e-10
    torch_fn, jax_fn = _fixed_logits_fn(3)

    ns = _extract_eval_ns([e for e in exp], [])
    self = _make_ref_self(ns)
    _attach_forward(self, torch_fn)
    ref_tokens = _run_reference_ddpm(self, ns, None, None)

    sample = _our_sampler("ddpm", jax_fn)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((SB, SL), jnp.int32), jnp.zeros((SB, SL), bool),
                 None, {"exp": jnp.asarray(exp)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


def test_ddpm_cfg_token_parity_vs_reference_code():
    """CFG path: conditioning re-mask, time-annealed w(t), doubled batch
    (reference: model_eval.py:1761-1833)."""
    rng = np.random.RandomState(4)
    exp = rng.exponential(size=(STEPS, SB, SL, SV)).astype(np.float32) + 1e-10
    torch_fn, jax_fn = _fixed_logits_fn(5)
    x0_np = rng.randint(0, SV - 1, (SB, SL)).astype(np.int64)
    unmask_np = np.zeros((SB, SL), bool)
    unmask_np[:, :3] = True

    ns = _extract_eval_ns([e for e in exp], [])
    self = _make_ref_self(ns, cfg_w=2.0)
    _attach_forward(self, torch_fn)
    ref_tokens = _run_reference_ddpm(
        self, ns, torch.tensor(x0_np), torch.tensor(unmask_np))

    sample = _our_sampler("ddpm", jax_fn, cfg_w=2.0)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.asarray(x0_np.astype(np.int32)), jnp.asarray(unmask_np),
                 None, {"exp": jnp.asarray(exp)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


def test_maskgit_token_parity_vs_reference_code():
    """Confidence unmasking: adap_sche + multinomial + Gumbel·r_temp·t,
    top-k threshold (reference: model_eval.py:2964-3001, 3045-3114)."""
    rng = np.random.RandomState(7)
    exp = rng.exponential(size=(STEPS, SB, SL, SV)).astype(np.float32) + 1e-10
    gum = rng.gumbel(size=(STEPS, SB, SL)).astype(np.float64)
    torch_fn, jax_fn = _fixed_logits_fn(8)

    ns = _extract_eval_ns([e for e in exp], [g for g in gum])
    self = _make_ref_self(ns)
    _attach_forward(self, torch_fn)

    x = torch.full((SB, SL), SMASK, dtype=torch.long)
    schedule = ns["adap_sche"](x, STEPS, SMASK, mode="arccos")
    timesteps = torch.linspace(1, EPS, STEPS + 1)
    dt = (1 - EPS) / STEPS
    for i in range(STEPS):
        t = timesteps[i] * torch.ones(SB, 1)
        x, _ = ns["_maskgit_update"](self, x, t, dt,
                                     schedule=schedule, step=i)
    ref_tokens = x.numpy()

    # our schedule must match the reference's adap_sche exactly
    ours_sche = np.asarray(adaptive_schedule(
        jnp.full((SB,), SL), STEPS, "arccos"))
    np.testing.assert_array_equal(ours_sche, schedule.numpy())

    sample = _our_sampler("maskgit", jax_fn)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((SB, SL), jnp.int32), jnp.zeros((SB, SL), bool),
                 None, {"exp": jnp.asarray(exp),
                        "gumbel": jnp.asarray(gum.astype(np.float32))})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


def test_subs_parameterization_parity_vs_reference_code():
    """Direct fn compare incl. carry-over and multimodal vocab restriction
    (reference: model.py:621-658)."""
    ns = extract_functions(MODEL, ["_subs_parameterization"])
    rng = np.random.RandomState(11)
    logits = rng.randn(SB, SL, SV).astype(np.float32) * 3
    xt = rng.randint(0, SV, (SB, SL)).astype(np.int64)
    xt[:, ::3] = SMASK
    modality = (rng.rand(SB, SL) < 0.5).astype(np.int64)
    tvs = SV // 2

    for force, mod in ((False, None), (True, modality)):
        self = _make_ref_self(ns, force_argmax=force, multimodal=True,
                              text_vocab_size=tvs)
        ref = ns["_subs_parameterization"](
            self, torch.tensor(logits), torch.tensor(xt),
            modality=None if mod is None else torch.tensor(mod)).numpy()
        ours = np.asarray(subs_parameterization(
            jnp.asarray(logits), jnp.asarray(xt), SMASK,
            modality=None if mod is None else jnp.asarray(mod),
            text_vocab_size=tvs if force else None))
        # compare probabilities (exp) — the -inf fill values differ in
        # magnitude representation but the distributions must match
        np.testing.assert_allclose(np.exp(ours), np.exp(ref),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_cfg_weight_parity_vs_reference_code():
    """w(t) incl. min/max windows and the cfg==-1 linspace sweep
    (reference: model_eval.py:1737-1759)."""
    ns = extract_functions(MODEL_EVAL, ["get_cfg_weight"])

    from unidisc_tpu.sampling.sampler import guidance_weight

    def ours_w(cfg_w, t_np, lo=None, hi=None):
        cfg = Config.make("tiny").override(**{
            "sampling.cfg": cfg_w, "sampling.cfg_min_timestep": lo,
            "sampling.cfg_max_timestep": hi})
        return np.asarray(guidance_weight(cfg.sampling, jnp.asarray(t_np)))

    # plain annealed modes, batch of 4 — t shaped (B,1) as _sample passes it
    t_np = np.array([0.9, 0.5, 0.2, 0.05], np.float32)
    for cfg_w in (2.0, 5.0):
        self = _make_ref_self(ns, cfg_w=cfg_w)
        ref = ns["get_cfg_weight"](self, torch.tensor(t_np)[:, None]).numpy()
        np.testing.assert_allclose(ours_w(cfg_w, t_np), ref.reshape(-1),
                                   rtol=1e-6, atol=1e-7)

    # sweep mode (cfg==-1): per-sample linspace(0,10,B). NOTE the reference
    # computes `_cfg * (1 - t)` which with the (B,1)-shaped t from _sample
    # broadcasts to an outer product — a latent shape bug; with (B,)-shaped
    # t it yields the intended per-sample weights, which is what we match.
    self = _make_ref_self(ns, cfg_w=-1)
    ref = ns["get_cfg_weight"](self, torch.tensor(t_np)).numpy()
    np.testing.assert_allclose(ours_w(-1, t_np), ref.reshape(-1),
                               rtol=1e-6, atol=1e-7)

    # min/max windows (B=1: the reference's (B,1)-vs-(B,1,1) torch.where
    # broadcast is only well-formed for B=1)
    for tv in (0.95, 0.5, 0.05):
        self = _make_ref_self(ns, cfg_w=3.0)
        self.config.eval.cfg_min_timestep = 0.1
        self.config.eval.cfg_max_timestep = 0.9
        t1 = np.array([tv], np.float32)
        ref = ns["get_cfg_weight"](self, torch.tensor(t1)[:, None]).numpy()
        np.testing.assert_allclose(ours_w(3.0, t1, lo=0.1, hi=0.9),
                                   ref.reshape(-1), rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# 4. PRODUCTION models/dit.py parity — the HF-mixin class the published
#    checkpoints (aswerdlow/unidisc_*) load into (reference:
#    models/dit.py:1095). Three variants: the large_scale_train production
#    feature set (rms + qk-norm + sandwich + modality-embed + 2D rope),
#    the interleaved require_sample_ids path (per-resolution rope buffers +
#    img_count_embedding + add_img/txt_data_to_blocks stitching,
#    models/dit.py:122-191, 1203-1232), and the default-config split-embed
#    path (use_pretrained_img_emb: frozen VQ-codebook image embedding +
#    projection, models/dit.py:1343-1359). port_dit_state_dict maps the
#    production key names (blocks.{i}.attention.*), so these fail on any
#    architecture or key-name drift.
# ---------------------------------------------------------------------------

PHID, PHEADS, PBLOCKS = 64, 4, 2
PV, PTVS = 32, 16


def _prod_ref_config(*, length, txt_length, img_length,
                     require_sample_ids=False, production=True,
                     use_pretrained_img_emb=False,
                     multimodal_batches=True, time_conditioning=True,
                     img_cond=False, cond_image_vocab_size=None,
                     use_spda_attn=True):
    return types.SimpleNamespace(
        time_conditioning=time_conditioning, parameterization="subs",
        model=types.SimpleNamespace(
            hidden_size=PHID, cond_dim=PHID, n_heads=PHEADS,
            n_blocks=PBLOCKS, dropout=0.0, attn_type="flash",
            force_varlen_attn=False,
            norm_type="rms" if production else "layernorm",
            qk_norm=production, use_flash_attn_3=False,
            use_spda_attn=use_spda_attn,
            sandwich_normalization=production, full_attention=True,
            modality_embed=production, rope_2d=production,
            zero_linear_init=True, scale_by_sigma=False,
            length=length, txt_length=txt_length, img_length=img_length,
            use_pretrained_img_emb=use_pretrained_img_emb,
            img_cond=img_cond, cond_image_vocab_size=cond_image_vocab_size,
            force_optimized_native_attn=False),
        trainer=types.SimpleNamespace(
            use_gradient_checkpointing=False, compile=False,
            compile_flag_pos_emb=True,
            multimodal_batches=multimodal_batches,
            image_mode="discrete"),
        data=types.SimpleNamespace(require_sample_ids=require_sample_ids),
    )


def _randomize(ref, seed=42, scale=0.05):
    """Randomize ALL torch params (the adaLN-zero head otherwise
    trivializes logit comparison)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    ref.eval()
    return ref


def _port_and_compare(ref, cfg, idx, sigma, ref_logits, atol, **kw):
    model = DIT(cfg, compute_dtype=jnp.float32)
    jidx = jnp.asarray(idx.astype(np.int32))
    jsig = jnp.asarray(sigma)
    params = model.init({"params": jax.random.PRNGKey(0)}, jidx, jsig,
                        **kw)["params"]
    params = port_dit_state_dict(
        params, {k: v.numpy() for k, v in ref.state_dict().items()})
    ours = np.asarray(model.apply({"params": params}, jidx, jsig, **kw))
    np.testing.assert_allclose(ours, ref_logits, atol=atol, rtol=1e-3)


def test_production_dit_logits_parity():
    """large_scale_train feature set, non-interleaved [txt|img] layout
    (reference: models/dit.py:1095 + configs/experiments/
    large_scale_train.yaml:84-90)."""
    install_torch_stubs()
    import models.dit as ref_dit

    T, I = 8, 16
    L = T + I
    torch.manual_seed(0)
    ref = _randomize(ref_dit.DIT(
        _prod_ref_config(length=L, txt_length=T, img_length=I),
        vocab_size=PV, text_vocab_size=PTVS, mask_index=PTVS - 1))

    rng = np.random.RandomState(1)
    idx = rng.randint(0, PV, (2, L)).astype(np.int64)
    sigma = rng.rand(2).astype(np.float32)
    modality = np.concatenate([np.zeros((2, T)), np.ones((2, I))],
                              1).astype(np.int64)
    with torch.no_grad():
        ref_logits = ref(torch.tensor(idx), torch.tensor(sigma),
                         modality=torch.tensor(modality)).numpy()

    cfg = ModelConfig(
        name="prod-parity", hidden_size=PHID, cond_dim=PHID,
        n_blocks=PBLOCKS, n_heads=PHEADS, dropout=0.0, length=L,
        txt_length=T, img_length=I, text_vocab_size=PTVS,
        image_vocab_size=PV - PTVS, norm_type="rms", qk_norm=True,
        sandwich_normalization=True, modality_embed=True, rope_2d=True,
        time_conditioning=True, attn_backend="xla")
    _port_and_compare(ref, cfg, idx, sigma, ref_logits, atol=5e-4,
                      modality=jnp.asarray(modality.astype(np.int32)))


def test_production_dit_interleaved_parity():
    """require_sample_ids path: a packed batch with 256-token image
    blocks through the ACTUAL add_img_data_to_blocks /
    add_txt_data_to_blocks stitching + img_count_embedding (reference:
    models/dit.py:122-191, 1203-1232) vs our static rope_index /
    img_block_index redesign."""
    install_torch_stubs()
    import models.dit as ref_dit

    from unidisc_tpu.models.rotary import build_multires_rope

    L = 524  # [txt 8][img 256][txt 4][img 256]
    torch.manual_seed(0)
    ref = _randomize(ref_dit.DIT(
        _prod_ref_config(length=L, txt_length=8, img_length=256,
                         require_sample_ids=True),
        vocab_size=PV, text_vocab_size=PTVS, mask_index=PTVS - 1))

    rng = np.random.RandomState(1)

    def seq(row_samples):
        ids = np.zeros(L, np.int64)
        mod = np.zeros(L, np.int64)
        sid = np.zeros(L, np.int64)
        ropei = np.zeros(L, np.int64)
        ibi = np.zeros(L, np.int64)
        pos = 0
        samp_off, img_cnt = {}, {}
        for s, kind, n in row_samples:
            off = samp_off.get(s, 0)
            if kind == "txt":
                ids[pos:pos + n] = rng.randint(0, PTVS, n)
                ropei[pos:pos + n] = np.arange(off, off + n)
            else:
                ids[pos:pos + n] = PTVS + rng.randint(0, PV - PTVS, n)
                mod[pos:pos + n] = 1
                ropei[pos:pos + n] = np.arange(n)
                cnt = img_cnt.get(s, 0)
                ibi[pos:pos + n] = cnt
                img_cnt[s] = cnt + 1
            sid[pos:pos + n] = s
            samp_off[s] = off + n
            pos += n
        assert pos == L
        return ids, mod, sid, ropei, ibi

    # row 0: one sample w/ TWO image blocks (img_count 0 and 1);
    # row 1: two samples (attention isolation + per-sample rope restart)
    r0 = seq([(0, "txt", 8), (0, "img", 256), (0, "txt", 4),
              (0, "img", 256)])
    r1 = seq([(0, "txt", 8), (0, "img", 256), (1, "txt", 4),
              (1, "img", 256)])
    idx, modality, sample_ids, ropei, ibi = (
        np.stack([a, b]) for a, b in zip(r0, r1))
    sigma = rng.rand(2).astype(np.float32)
    dense = (sample_ids[:, :, None] == sample_ids[:, None, :])[:, None]

    with torch.no_grad():
        ref_logits = ref(torch.tensor(idx), torch.tensor(sigma),
                         modality=torch.tensor(modality),
                         sample_ids=torch.tensor(sample_ids),
                         attention_mask=torch.tensor(dense)).numpy()

    cfg = ModelConfig(
        name="prod-parity-il", hidden_size=PHID, cond_dim=PHID,
        n_blocks=PBLOCKS, n_heads=PHEADS, dropout=0.0, length=L,
        txt_length=8, img_length=256, text_vocab_size=PTVS,
        image_vocab_size=PV - PTVS, norm_type="rms", qk_norm=True,
        sandwich_normalization=True, modality_embed=True, rope_2d=True,
        time_conditioning=True, attn_backend="xla",
        img_resolutions=(256,), img_count_embed=True)
    _, _, offsets = build_multires_rope(L, (256,), PHID // PHEADS)
    rope_index = np.where(modality == 1, offsets[256] + ropei, ropei)
    _port_and_compare(
        ref, cfg, idx, sigma, ref_logits, atol=1e-3,
        modality=jnp.asarray(modality.astype(np.int32)),
        sample_ids=jnp.asarray(sample_ids.astype(np.int32)),
        rope_index=jnp.asarray(rope_index.astype(np.int32)),
        img_block_index=jnp.asarray(ibi.astype(np.int32)))


def test_production_dit_split_embed_parity():
    """use_pretrained_img_emb (default-config checkpoints): text through
    the (text_vocab+1)-row table, image ids through the frozen VQ
    codebook + projection (reference: models/dit.py:1343-1359,
    configs/config.yaml:135), incl. mask tokens."""
    install_torch_stubs()
    import sys as _sys

    IMG_EMB_DIM = 8
    fake_model = types.ModuleType("model")

    def get_vae(config, device, use_cond=False):
        vae = types.SimpleNamespace()
        vae.quantize = types.SimpleNamespace(
            embedding=torch.nn.Embedding(PV - PTVS, IMG_EMB_DIM))
        return vae

    fake_model.get_vae = get_vae
    old = _sys.modules.get("model")
    _sys.modules["model"] = fake_model
    try:
        import models.dit as ref_dit

        T, I = 8, 16
        L = T + I
        MASK = PTVS - 1
        torch.manual_seed(0)
        ref = _randomize(ref_dit.DIT(
            _prod_ref_config(length=L, txt_length=T, img_length=I,
                             production=False, use_pretrained_img_emb=True,
                             multimodal_batches=False),
            vocab_size=PV, text_vocab_size=PTVS, mask_index=MASK))

        rng = np.random.RandomState(1)
        idx = rng.randint(0, PV, (2, L)).astype(np.int64)
        idx[:, ::5] = MASK  # exercise the mask-row branch
        sigma = rng.rand(2).astype(np.float32)
        with torch.no_grad():
            ref_logits = ref(torch.tensor(idx), torch.tensor(sigma)).numpy()

        cfg = ModelConfig(
            name="prod-split", hidden_size=PHID, cond_dim=PHID,
            n_blocks=PBLOCKS, n_heads=PHEADS, dropout=0.0, length=L,
            txt_length=T, img_length=I, text_vocab_size=PTVS,
            image_vocab_size=PV - PTVS, norm_type="layernorm",
            qk_norm=False, sandwich_normalization=False,
            modality_embed=False, rope_2d=False, time_conditioning=True,
            attn_backend="xla", split_embed=True,
            img_embed_dim=IMG_EMB_DIM)
        _port_and_compare(ref, cfg, idx, sigma, ref_logits, atol=5e-4)
    finally:
        if old is None:
            _sys.modules.pop("model", None)
        else:
            _sys.modules["model"] = old


def test_production_dit_img_cond_parity():
    """img_cond cross-attention conditioning (reference
    models/dit.py:1147-1183 cond trunk + 910-911/998-1010 per-block
    cross-attention + 651-735/834-835 cross Attention): a conditioning
    token stream runs through its own encoder blocks, then every main
    block cross-attends to it (Q main / K,V cond) with the cross output
    added to the BLOCK INPUT residual.

    Latent reference bugs worked around with the only runnable reading
    (the established convention for paths the reference cannot execute
    as written):
      * img_cond_rotary_emb is called with the x_cond TENSOR
        (models/dit.py:1392) but Rotary.forward takes a seq_len int
        (models/dit.py:316) and caches legacy 5-dim tables no current
        apply path accepts — patched to plain (S, d/2) 1D tables, the
        same form the main stream uses;
      * the cond-block arg tuple passes the main attention_mask into
        the cond stream at the wrong arity (models/dit.py:1393) — only
        runnable with attention_mask=None;
      * cross attention requires the raw flash path (use_spda_attn
        routes cross into the self-attn sdpa branch and ignores
        K_cond/V_cond, models/dit.py:758-835) — so use_spda_attn=False.
    """
    install_torch_stubs()
    import models.dit as ref_dit

    T, I, LC, CV = 8, 16, 12, 20
    L = T + I
    torch.manual_seed(0)
    ref = ref_dit.DIT(
        _prod_ref_config(length=L, txt_length=T, img_length=I,
                         production=False, multimodal_batches=False,
                         time_conditioning=False, img_cond=True,
                         cond_image_vocab_size=CV, use_spda_attn=False),
        vocab_size=PV, text_vocab_size=PTVS, mask_index=PTVS - 1)
    ref = _randomize(ref)

    # only runnable reading of the cond rotary (see docstring): plain 1D
    # tables over the cond positions, (S, d/2) form
    from models.standalone_rotary import flash_torch_apply_rotary_emb_torch  # noqa: F401
    cos_1d = ref.rotary_cos_emb.clone()
    sin_1d = ref.rotary_sin_emb.clone()
    class _CondRotary(torch.nn.Module):
        def forward(self, x_cond):
            return cos_1d[:x_cond.shape[1]], sin_1d[:x_cond.shape[1]]

    ref.img_cond_rotary_emb = _CondRotary()

    rng = np.random.RandomState(1)
    idx = rng.randint(0, PV, (2, L)).astype(np.int64)
    x_cond = rng.randint(0, CV, (2, LC)).astype(np.int64)
    sigma = rng.rand(2).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.tensor(idx), torch.tensor(sigma),
                         x_cond=torch.tensor(x_cond)).numpy()

    cfg = ModelConfig(
        name="prod-imgcond", hidden_size=PHID, cond_dim=PHID,
        n_blocks=PBLOCKS, n_heads=PHEADS, dropout=0.0, length=L,
        txt_length=T, img_length=I, text_vocab_size=PTVS,
        image_vocab_size=PV - PTVS, norm_type="layernorm",
        qk_norm=False, sandwich_normalization=False,
        modality_embed=False, rope_2d=False, time_conditioning=False,
        attn_backend="xla", img_cond=True, cond_image_vocab_size=CV,
        cond_length=LC, n_cond_blocks=8)
    _port_and_compare(ref, cfg, idx, sigma, ref_logits, atol=5e-4,
                      x_cond=jnp.asarray(x_cond.astype(np.int32)))

    # checkpoint-drop protocol: img_cond architecture is shape-inferable
    from unidisc_tpu.models.port import infer_dit_overrides
    over = infer_dit_overrides(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    assert over["model.img_cond"]
    assert over["model.cond_image_vocab_size"] == CV
    assert over["model.n_cond_blocks"] == 8


# ---------------------------------------------------------------------------
# 5. Remaining sampler paths (round-3): ddpm_cache (the DEFAULT predictor,
#    configs/config.yaml:38), first-hitting, maskgit-nucleus, the AR
#    sampler (+ nucleus_sampling), and the analytic/SEDD update — each
#    driven token-for-token against the AST-extracted reference code with
#    shared injected noise.
# ---------------------------------------------------------------------------

MODEL_UTILS = "/root/reference/model_utils.py"


def test_ddpm_cache_token_parity_vs_reference_code():
    """MDLM caching predictor: p_x0 reuse while x is unchanged + the
    driver's allclose cache-invalidate rule (reference:
    model_eval.py:2072-2104 and the ddpm_cache branch :2381-2385)."""
    rng = np.random.RandomState(20)
    exp = rng.exponential(size=(STEPS, SB, SL, SV)).astype(np.float32) + 1e-10
    torch_fn, jax_fn = _fixed_logits_fn(21)

    ns = _extract_eval_ns([e for e in exp], [])
    self = _make_ref_self(ns)
    _attach_forward(self, torch_fn)

    x = torch.full((SB, SL), SMASK, dtype=torch.long)
    timesteps = torch.linspace(1, EPS, STEPS + 1)
    dt = (1 - EPS) / STEPS
    p_cache = None
    ref_nfe = 0
    for i in range(STEPS):
        t = timesteps[i] * torch.ones(SB, 1)
        p_cache, x_next, nfe = ns["_ddpm_caching_update"](
            self, x, t, dt, p_x0=p_cache)
        ref_nfe += nfe
        if not torch.allclose(x_next, x):
            p_cache = None  # driver rule (model_eval.py:2383)
        x = x_next
    ref_tokens = x.numpy()

    sample = _our_sampler("ddpm_cache", jax_fn)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((SB, SL), jnp.int32), jnp.zeros((SB, SL), bool),
                 None, {"exp": jnp.asarray(exp)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)
    assert int(out.nfe) == ref_nfe  # cache hits must line up exactly


def test_first_hitting_token_parity_vs_reference_code():
    """First-hitting unmasker: categorical token draw + uniformly-random
    position selection (reference: model_eval.py:3004-3043)."""
    rng = np.random.RandomState(24)
    exp = rng.exponential(size=(STEPS, SB, SL, SV)).astype(np.float32) + 1e-10
    rand = rng.rand(STEPS, SB, SL).astype(np.float32)
    torch_fn, jax_fn = _fixed_logits_fn(25)

    ns = _extract_eval_ns([e for e in exp], [], rand_queue=[r for r in rand])
    self = _make_ref_self(ns)
    _attach_forward(self, torch_fn)

    x = torch.full((SB, SL), SMASK, dtype=torch.long)
    schedule = ns["adap_sche"](x, STEPS, SMASK, mode="arccos")
    timesteps = torch.linspace(1, EPS, STEPS + 1)
    dt = (1 - EPS) / STEPS
    for i in range(STEPS):
        t = timesteps[i] * torch.ones(SB, 1)
        x, _ = ns["_first_hitting_update"](self, x, t, dt,
                                           schedule=schedule, step=i)
    ref_tokens = x.numpy()

    sample = _our_sampler("first_hitting", jax_fn)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((SB, SL), jnp.int32), jnp.zeros((SB, SL), bool),
                 None, {"exp": jnp.asarray(exp), "uniform": jnp.asarray(rand)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


def test_maskgit_nucleus_token_parity_vs_reference_code():
    """Top-p maskgit variant (reference: model_eval.py:3117-3168 +
    nucleus_sampling_batch :2642-2689). B=1: the reference's
    `if num_unmask <= 0` bool() on a (B,)-tensor only runs for B=1.
    Covers the probs/temperature (no re-softmax) cutoff semantics and
    sorted-space multinomial."""
    B1 = 1
    rng = np.random.RandomState(27)
    exp = rng.exponential(size=(STEPS, B1, SL, SV)).astype(np.float32) + 1e-10
    gum = rng.gumbel(size=(STEPS, B1, SL)).astype(np.float64)
    torch_fn, jax_fn = _fixed_logits_fn(28)

    ns = _extract_eval_ns([e for e in exp], [g for g in gum])
    self = _make_ref_self(ns)
    self.config.eval.top_p = 0.9
    self.config.eval.temperature = 0.9
    _attach_forward(self, torch_fn)

    x = torch.full((B1, SL), SMASK, dtype=torch.long)
    schedule = ns["adap_sche"](x, STEPS, SMASK, mode="arccos")
    timesteps = torch.linspace(1, EPS, STEPS + 1)
    dt = (1 - EPS) / STEPS
    for i in range(STEPS):
        t = timesteps[i] * torch.ones(B1, 1)
        x, _ = ns["_maskgit_nucleus_update"](self, x, t, dt,
                                             schedule=schedule, step=i)
    ref_tokens = x.numpy()

    cfg = Config.make("tiny").override(**{
        "model.length": SL, "model.txt_length": SL, "model.img_length": 0,
        "model.text_vocab_size": SV, "model.image_vocab_size": 0,
        "sampling.predictor": "maskgit_nucleus", "sampling.steps": STEPS,
        "sampling.cfg": None, "sampling.noise_removal": False,
        "sampling.top_p": 0.9, "sampling.temperature": 0.9})
    sample = jax.jit(build_sampler(jax_fn, cfg, inject_noise=True))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((B1, SL), jnp.int32), jnp.zeros((B1, SL), bool),
                 None, {"exp": jnp.asarray(exp),
                        "gumbel": jnp.asarray(gum.astype(np.float32))})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


def _make_ar_self(ns, *, cfg_w=None, top_p=None, temperature=1.0,
                  length, bos, force_argmax=False, tvs=None):
    self = _make_ref_self(ns, cfg_w=cfg_w, force_argmax=force_argmax,
                          text_vocab_size=tvs)
    self.config.model.length = length
    self.config.model.use_kv_cache = False
    self.config.model.force_argmax_valid_indices = force_argmax
    self.config.eval.top_p = top_p
    self.config.eval.temperature = temperature
    # constant CFG weight: the ONLY runnable reference AR+CFG config —
    # the annealed get_cfg_weight(float) call crashes upstream
    # ((_cfg*(1-t))[:, None] on a float, model_eval.py:1746)
    self.config.eval.force_cfg_value = cfg_w is not None
    self.use_kv_cache = False
    self.vocab_size = SV
    self.tokenizer = types.SimpleNamespace(bos_token_id=bos)
    return self


def _causal_table_fns(seed):
    """Causal fixed logits: logits[b, j] = E[x_j] + 0.25 * mean_{j'<=j}
    E[x_j'], identical in torch (full prefix) and JAX (incremental cache).
    The mask row is pushed far down so the reference's unrestricted AR
    argmax (it never masks mask_index) can't pick it."""
    table = np.random.RandomState(seed).randn(SV, SV).astype(np.float32) * 2
    table[:, SMASK] -= 100.0

    def torch_forward(self):
        def forward(x=None, sigma=None, modality=None, start_pos=None,
                    disable_ar_shift=True, **kw):
            e = torch.as_tensor(table)[x]                     # (B, L', V)
            csum = torch.cumsum(e, dim=1)
            cnt = torch.arange(1, x.shape[1] + 1,
                               dtype=e.dtype)[None, :, None]
            return e + 0.25 * csum / cnt
        self.forward = forward

    def apply_token(params, tok, kv, cache_index, modality_tok):
        # kv = {"sum": (B, V), "cnt": ()} running prefix mean state
        e = jnp.asarray(table)[tok[:, 0]]                     # (B, V)
        new_sum = kv["sum"] + e
        cnt = kv["cnt"] + 1.0
        logits = e + 0.25 * new_sum / cnt
        return logits[:, None, :], {"sum": new_sum, "cnt": cnt}

    return torch_forward, apply_token


def _patched_ar_sampler(monkeypatch, cfg):
    """build_ar_sampler with the DIT KV cache swapped for the test's
    running-sum cache (same scan-carry contract)."""
    import unidisc_tpu.sampling.ar_sampler as ar_mod

    def fake_cache(m, batch, max_len=None):
        return {"sum": jnp.zeros((batch, SV), jnp.float32),
                "cnt": jnp.zeros((), jnp.float32)}

    monkeypatch.setattr(ar_mod, "init_kv_cache_for", fake_cache)
    return ar_mod.build_ar_sampler


def test_ar_sampler_cfg_token_parity_vs_reference_code(monkeypatch):
    """The actual _ar_sampler loop (reference: model_eval.py:2736-2822):
    BOS + prompt conditioning, doubled-batch CFG at the constant
    force_cfg_value weight (the annealed path is a latent upstream crash,
    see SamplingConfig.force_cfg_value), precomputed Gumbel noise,
    per-step clamping."""
    L = SL
    rng = np.random.RandomState(30)
    gum = rng.gumbel(size=(SB, L - 1, SV)).astype(np.float32)
    torch_forward, apply_token = _causal_table_fns(31)

    ns = _extract_eval_ns([], [], torch_gumbel_queue=[gum])
    self = _make_ar_self(ns, cfg_w=2.0, length=L, bos=1)
    torch_forward(self)

    x0_np = rng.randint(0, SV - 1, (SB, L)).astype(np.int64)
    x0_np[:, 0] = 1  # BOS
    unmask_np = np.zeros((SB, L), bool)
    unmask_np[:, :3] = True
    modality_np = np.zeros((SB, L), np.int64)

    ref_tokens, _ = ns["_ar_sampler"](
        self, SB, x0=torch.tensor(x0_np), x0_unmask=torch.tensor(unmask_np),
        modality=torch.tensor(modality_np))
    ref_tokens = ref_tokens.numpy()

    cfg = Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": L, "model.img_length": 0,
        "model.text_vocab_size": SV, "model.image_vocab_size": 0,
        "model.full_attention": False, "trainer.parameterization": "ar",
        "sampling.cfg": 2.0, "sampling.force_cfg_value": True,
        "sampling.temperature": 1.0, "sampling.top_p": None})
    build = _patched_ar_sampler(monkeypatch, cfg)
    sample = jax.jit(build(apply_token, cfg))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.asarray(x0_np.astype(np.int32)), jnp.asarray(unmask_np),
                 jnp.asarray(modality_np.astype(np.int32)),
                 injected={"gumbel": jnp.asarray(gum.transpose(1, 0, 2))})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


def test_ar_sampler_nucleus_token_parity_vs_reference_code(monkeypatch):
    """AR nucleus path (reference: model_eval.py:2691-2728
    nucleus_sampling + :2800): softmax(logits/temperature), largest
    prefix with mass <= top_p, sorted-space multinomial."""
    L = SL
    rng = np.random.RandomState(34)
    exp = rng.exponential(size=(L - 1, SB, SV)).astype(np.float32) + 1e-10
    torch_forward, apply_token = _causal_table_fns(35)

    ns = _extract_eval_ns([e for e in exp], [])
    self = _make_ar_self(ns, cfg_w=None, top_p=0.9, temperature=0.8,
                         length=L, bos=1)
    torch_forward(self)

    x0_np = rng.randint(0, SV - 1, (SB, L)).astype(np.int64)
    x0_np[:, 0] = 1
    unmask_np = np.zeros((SB, L), bool)
    unmask_np[:, :2] = True
    modality_np = np.zeros((SB, L), np.int64)

    ref_tokens, _ = ns["_ar_sampler"](
        self, SB, x0=torch.tensor(x0_np), x0_unmask=torch.tensor(unmask_np),
        modality=torch.tensor(modality_np))
    ref_tokens = ref_tokens.numpy()

    cfg = Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": L, "model.img_length": 0,
        "model.text_vocab_size": SV, "model.image_vocab_size": 0,
        "model.full_attention": False, "trainer.parameterization": "ar",
        "sampling.cfg": None, "sampling.temperature": 0.8,
        "sampling.top_p": 0.9})
    build = _patched_ar_sampler(monkeypatch, cfg)
    sample = jax.jit(build(apply_token, cfg))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.asarray(x0_np.astype(np.int32)), jnp.asarray(unmask_np),
                 jnp.asarray(modality_np.astype(np.int32)),
                 injected={"exp": jnp.asarray(exp)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


def test_analytic_sedd_token_parity_vs_reference_code():
    """Analytic/SEDD updates (reference: model_utils.py:371-438 get_score,
    _staggered_score, _transp_transition, _analytic_update,
    _denoiser_update) driven step-for-step with injected exponentials."""
    import torch.nn.functional as F

    rng = np.random.RandomState(40)
    exp = rng.exponential(
        size=(STEPS + 1, SB, SL, SV)).astype(np.float32) + 1e-10
    torch_fn, jax_fn = _fixed_logits_fn(41)

    exp_queue = [e for e in exp]

    def injected_sample_categorical(probs):
        e = torch.as_tensor(exp_queue.pop(0),
                            dtype=probs.dtype).reshape(probs.shape)
        return (probs / e).argmax(-1)

    ns = extract_functions(
        MODEL_UTILS,
        ["get_score", "_staggered_score", "_transp_transition",
         "_analytic_update", "_denoiser_update", "_unsqueeze"],
        extra_globals={
            "_sample_categorical": injected_sample_categorical,
            "F": F,
        })
    ns["_subs_parameterization"] = extract_functions(
        MODEL, ["_subs_parameterization"])["_subs_parameterization"]
    self = _make_ref_self(ns)
    self.vocab_size = SV
    self.get_score = lambda *a, **k: ns["get_score"](self, *a, **k)
    self._staggered_score = \
        lambda *a, **k: ns["_staggered_score"](self, *a, **k)
    self._transp_transition = \
        lambda *a, **k: ns["_transp_transition"](self, *a, **k)
    _attach_forward(self, torch_fn)

    x = torch.full((SB, SL), SMASK, dtype=torch.long)
    timesteps = torch.linspace(1, EPS, STEPS + 1)
    dt = (1 - EPS) / STEPS
    for i in range(STEPS):
        t = timesteps[i] * torch.ones(SB, 1)
        x, _ = ns["_analytic_update"](self, x, t, dt)
    t = timesteps[-1] * torch.ones(SB, 1)
    x = ns["_denoiser_update"](self, x, t)
    ref_tokens = x.numpy()

    from unidisc_tpu.sampling.extras import build_analytic_sampler
    cfg = Config.make("tiny").override(**{
        "model.length": SL, "model.txt_length": SL, "model.img_length": 0,
        "model.text_vocab_size": SV, "model.image_vocab_size": 0,
        "sampling.predictor": "analytic", "sampling.steps": STEPS})
    sample = jax.jit(build_analytic_sampler(jax_fn, cfg))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((SB, SL), jnp.int32), jnp.zeros((SB, SL), bool),
                 None, injected={"exp": jnp.asarray(exp)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


# ---------------------------------------------------------------------------
# 6. Published-checkpoint DROP protocol (round-3): a model.safetensors in
#    the PyTorchModelHubMixin layout dropped on disk must serve through
#    build_engine(reference_ckpt=...) with the architecture inferred from
#    the weights — no hand-matched flags (models/port.py
#    infer_dit_overrides / read_reference_state_dict).
# ---------------------------------------------------------------------------

def test_infer_overrides_joint_vocab_and_flags():
    """Shape-only inference on a production-style (joint-table)
    state_dict: hidden/blocks/heads/cond, rms-vs-layernorm, sandwich,
    modality, and the 16384-way VQ vocab-split heuristic."""
    from unidisc_tpu.models.port import infer_dit_overrides
    H, COND = 768, 16  # 768 -> 12 heads in the reference zoo
    z = np.zeros
    sd = {
        "vocab_embed.embedding": z((48385, H)),
        "sigma_map.mlp.0.weight": z((COND, 256)),
        "sigma_map.mlp.0.bias": z((COND,)),
        "sigma_map.mlp.2.weight": z((COND, COND)),
        "modality_embed.embedding": z((2, H)),
        # production naming nests attention.* — inference must normalize
        "blocks.0.attention.attn_qkv.weight": z((3 * H, H)),
        "blocks.0.attention.q_norm.weight": z((H,)),  # FULL hidden
        "blocks.0.mlp.0.weight": z((4 * H, H)),
        "blocks.0.norm1.weight": z((H,)),
        "blocks.0.pre_residual_norm.weight": z((H,)),
        "blocks.1.attention.attn_qkv.weight": z((3 * H, H)),
        "output_layer.linear.weight": z((48385, H)),
    }
    over = infer_dit_overrides(sd)
    assert over["model.hidden_size"] == H
    assert over["model.n_blocks"] == 2
    assert over["model.n_heads"] == 12         # reference zoo: 768 -> 12
    assert over["model.cond_dim"] == COND
    assert over["model.mlp_ratio"] == 4
    # rms vs bias-less layernorm: production markers present -> rms
    assert over["model.norm_type"] == "rms"
    assert over["model.qk_norm"] and over["model.sandwich_normalization"]
    assert over["model.modality_embed"] and over["model.time_conditioning"]
    assert not over["model.split_embed"]
    assert over["model.text_vocab_size"] == 32001   # 48385 - 16384
    assert over["model.image_vocab_size"] == 16384
    assert not over["model.cond_label"]
    # default-config family (no markers, bias-less LN): layernorm + no
    # head override for a non-zoo, non-64-divisible width
    sd2 = {k: v for k, v in sd.items()
           if "q_norm" not in k and "pre_residual" not in k
           and "modality" not in k}
    sd2 = {k: z(tuple(24 if d == H else d for d in v.shape))
           for k, v in sd2.items()}
    over2 = infer_dit_overrides(sd2)
    assert over2["model.norm_type"] == "layernorm"
    assert not over2["model.qk_norm"]
    assert "model.n_heads" not in over2        # preset keeps its heads


def test_reference_checkpoint_drop_serves(tmp_path):
    """End-to-end drop: save the ACTUAL production models/dit.py
    state_dict (split-embed variant — the default-config published
    layout) as model.safetensors, then build_engine(reference_ckpt=...)
    must (a) infer the architecture exactly, (b) logits-match the
    reference through the ported engine, (c) run the jitted sampler."""
    install_torch_stubs()
    import sys as _sys

    from safetensors.numpy import save_file

    IMG_EMB_DIM = 8
    fake_model = types.ModuleType("model")

    def get_vae(config, device, use_cond=False):
        vae = types.SimpleNamespace()
        vae.quantize = types.SimpleNamespace(
            embedding=torch.nn.Embedding(PV - PTVS, IMG_EMB_DIM))
        return vae

    fake_model.get_vae = get_vae
    old = _sys.modules.get("model")
    _sys.modules["model"] = fake_model
    try:
        import models.dit as ref_dit

        T, I = 8, 16
        L = T + I
        MASK = PTVS - 1
        torch.manual_seed(0)
        # head count is not weight-inferable; at hidden 64 the drop
        # protocol falls back to the head_dim-64 convention -> 1 head
        drop_cfg = _prod_ref_config(length=L, txt_length=T, img_length=I,
                                    production=False,
                                    use_pretrained_img_emb=True,
                                    multimodal_batches=False)
        drop_cfg.model.n_heads = 1
        ref = _randomize(ref_dit.DIT(
            drop_cfg, vocab_size=PV, text_vocab_size=PTVS,
            mask_index=MASK))
        path = str(tmp_path / "model.safetensors")
        save_file({k: v.numpy() for k, v in ref.state_dict().items()
                   if "rotary" not in k}, path)
    finally:
        if old is None:
            _sys.modules.pop("model", None)
        else:
            _sys.modules["model"] = old

    from unidisc_tpu.models.port import (infer_dit_overrides,
                                         read_reference_state_dict)
    over = infer_dit_overrides(read_reference_state_dict(path))
    assert over["model.hidden_size"] == PHID
    assert over["model.n_blocks"] == PBLOCKS
    assert over["model.split_embed"]
    assert over["model.text_vocab_size"] == PTVS
    assert over["model.image_vocab_size"] == PV - PTVS
    assert over["model.img_embed_dim"] == IMG_EMB_DIM
    assert over["model.time_conditioning"]

    from unidisc_tpu.serving.engine import build_engine
    eng = build_engine(preset="tiny", reference_ckpt=path, steps=4)
    m = eng.config.model
    assert m.hidden_size == PHID and m.split_embed

    # (b) logits parity through the DROPPED-and-PORTED engine params —
    # compared at fp32 on the engine's inferred config (the engine
    # itself serves in bf16, which is a dtype choice, not a drift)
    rng = np.random.RandomState(1)
    idx = rng.randint(0, PV, (2, L)).astype(np.int64)
    idx[:, ::5] = MASK
    sigma = rng.rand(2).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.tensor(idx), torch.tensor(sigma)).numpy()
    # same calling convention as the passing split-embed parity test:
    # modality omitted on both sides (each model then applies its own
    # default layout; passing an explicit all-text modality here would
    # diverge from the reference's txt|img default)
    f32 = DIT(eng.config.model, compute_dtype=jnp.float32)
    ours = np.asarray(f32.apply(
        {"params": eng.params}, jnp.asarray(idx.astype(np.int32)),
        jnp.asarray(sigma)))
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4, rtol=1e-3)
    # the serving (bf16) forward agrees to bf16 tolerance
    bf = np.asarray(eng.apply_fn(
        eng.params, jnp.asarray(idx.astype(np.int32)),
        jnp.asarray(sigma), None))
    assert np.max(np.abs(bf - ref_logits)) < 0.15

    # (c) the jitted sampler runs on the dropped weights at the
    # engine's serving layout
    Le = m.length
    x0 = np.full((1, Le), MASK, np.int32)
    out = eng._sampler(4)(eng._sampler_params, jax.random.PRNGKey(0),
                          jnp.asarray(x0),
                          jnp.zeros((1, Le), bool),
                          jnp.asarray(eng._layout(1)))
    toks = np.asarray(out.tokens)
    assert toks.shape == (1, Le) and (toks >= 0).all() and (toks < PV).all()

    # --reference-ckpt and --ckpt are mutually exclusive
    with pytest.raises(ValueError, match="pass one"):
        build_engine(preset="tiny", reference_ckpt=path, checkpoint="x")


# ---------------------------------------------------------------------------
# Tweedie reward-guided resampling vs the actual reference code
# (model_eval.py:3172-3285 _ddpm_update_finetune_controlled_tweedie)
# ---------------------------------------------------------------------------

def test_tweedie_token_parity_vs_reference_code():
    """Best-of-N reward resampling, token-for-token: per step the reference
    draws `repeats` candidates from q_xs, scores each by r(E[x0|xt]) — a
    SECOND forward at sigma_s, image-vocab argmax, decode, reward
    (model_eval.py:3216-3238) — and keeps the per-row argmax candidate.
    The decode is identity here (decode_latents stub); the reward is a
    deterministic linear functional both sides share."""
    TV, IV = 7, 5           # text/image vocab split; mask = TV-1 = 6
    TL, IL = 4, 6           # static [txt | img] layout, SL = 10
    MASKI = TV - 1
    REPEATS = 3
    rng = np.random.RandomState(21)
    exp = rng.exponential(
        size=(STEPS, REPEATS, SB, SL, SV)).astype(np.float32) + 1e-10
    torch_fn, jax_fn = _fixed_logits_fn(9)
    w_img = rng.randn(IL).astype(np.float32)

    ns = _extract_eval_ns([e for step in exp for e in step], [])
    self = _make_ref_self(ns)
    self.mask_index = MASKI
    self.text_vocab_size = TV
    self.static_img_sl = slice(TL, None)
    self.get_vae = lambda: None

    def reward_model(img_ids):
        # receives the "decoded image" = raw image ids (identity decode);
        # returns numpy scores, as the real LAION predictor does
        # (model_eval.py:3233-3238 torch.from_numpy(scorer))
        return (img_ids.numpy() * w_img).sum(-1).astype(np.float32)

    self.reward_model = reward_model
    _attach_forward(self, torch_fn)

    x = torch.full((SB, SL), MASKI, dtype=torch.long)
    timesteps = torch.linspace(1, EPS, STEPS + 1)
    dt = (1 - EPS) / STEPS
    for i in range(STEPS):
        t = timesteps[i] * torch.ones(SB, 1)
        x = ns["_ddpm_update_finetune_controlled_tweedie"](
            self, x, t, dt, repeats=REPEATS, sampling_step=i)
    # final noise removal (model_eval.py:2440-2446)
    t = timesteps[-1] * torch.ones(SB, 1)
    x = self.forward(x=x, sigma=self.noise(t)[0]).argmax(dim=-1)
    ref_tokens = x.numpy()

    from unidisc_tpu.sampling.extras import build_tweedie_sampler
    cfg = Config.make("tiny").override(**{
        "model.length": SL, "model.txt_length": TL, "model.img_length": IL,
        "model.text_vocab_size": TV, "model.image_vocab_size": IV,
        "sampling.steps": STEPS, "sampling.cfg": None})

    def reward_fn(img_ids):
        return (img_ids * jnp.asarray(w_img)).sum(-1)

    sample = jax.jit(build_tweedie_sampler(
        jax_fn, cfg, reward_fn, n_candidates=REPEATS,
        reward_on="tweedie_img"))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((SB, SL), jnp.int32), jnp.zeros((SB, SL), bool),
                 None, {"exp": jnp.asarray(exp)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


# ---------------------------------------------------------------------------
# Semi-AR block-stride generation vs the actual reference code
# (model_utils.py:305-332 sample_subs_guidance)
# ---------------------------------------------------------------------------

def test_semi_ar_token_parity_vs_reference_code():
    """Block-stride semi-AR, token-for-token: per stride the reference
    re-masks the trailing stride_length positions, runs int(1/dt)+1
    ddpm-caching updates on t_i = 1 - i*dt (the linearized move_chance = t
    form, incl. the final sub-zero step), then argmax-denoises at sigma=0
    and slides the window (model_utils.py:305-332)."""
    STRIDE, NSTRIDES = 3, 2
    DT = 0.25
    NSTEPS = int(1 / DT)  # 4 -> 5 updates per stride
    rng = np.random.RandomState(31)
    exp = rng.exponential(
        size=(NSTRIDES + 1, NSTEPS + 1, SB, SL, SV)).astype(np.float32) + 1e-10
    torch_fn, jax_fn = _fixed_logits_fn(13)

    ns = _extract_eval_ns([e for stride in exp for e in stride], [])
    semi_ns = extract_functions(
        "/root/reference/model_utils.py", ["sample_subs_guidance"],
        extra_globals={"torch": torch, "np": np})

    self = _make_ref_self(ns)
    self.dtype = torch.float32
    self.time_conditioning = False
    self.config.model = types.SimpleNamespace(
        length=SL, force_argmax_valid_indices=False)
    self.tokenizer = types.SimpleNamespace(
        eos_token_id=10 ** 9,  # never present: full-length sequences
        batch_decode=lambda arr: arr)  # identity decode keeps raw tokens
    self._sample_prior = lambda n, l: torch.full((n, l), SMASK,
                                                 dtype=torch.long)
    self._ddpm_caching_update = \
        lambda **kw: ns["_ddpm_caching_update"](self, **kw)
    _attach_forward(self, torch_fn)

    _, texts, _ = semi_ns["sample_subs_guidance"](
        self, n_samples=SB, stride_length=STRIDE, num_strides=NSTRIDES,
        dt=DT)
    ref_tokens = np.asarray(texts[-1])  # identity decode of the full concat
    assert ref_tokens.shape == (SB, NSTRIDES * STRIDE + SL)

    from unidisc_tpu.sampling.extras import build_semi_ar_sampler
    cfg = Config.make("tiny").override(**{
        "model.length": SL, "model.txt_length": SL, "model.img_length": 0,
        "model.text_vocab_size": SV, "model.image_vocab_size": 0,
        "model.time_conditioning": False, "sampling.cfg": None})
    sample = build_semi_ar_sampler(jax_fn, cfg, stride_length=STRIDE,
                                   num_strides=NSTRIDES, dt=DT)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0), SB,
                 injected={"exp": jnp.asarray(exp)})
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)
    assert not (np.asarray(out.tokens) == SMASK).any()
