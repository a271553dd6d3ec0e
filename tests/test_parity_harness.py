"""Token-for-token sampler parity harness (SURVEY hard part #1).

The samplers accept injected pre-drawn noise; a NUMPY implementation of the
reference's per-step update math (reference: _ddpm_update
model_eval.py:2042-2070; _maskgit_update :3045-3114; categorical via
probs/Exp(1) argmax model_utils.py:95-97) consumes the SAME noise arrays.
Every intermediate token sequence must match exactly. To check real
reference runs, dump torch's random draws into `injected` and re-run —
the harness removes the RNG mismatch between frameworks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.sampling.sampler import build_sampler

B, L, V = 2, 12, 16
MASK = 15
STEPS = 6
EPS = 1e-5


def config(predictor):
    return Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": L, "model.img_length": 0,
        "model.text_vocab_size": V, "model.image_vocab_size": 0,
        "sampling.predictor": predictor, "sampling.steps": STEPS,
        "sampling.noise_removal": False})


def fixed_forward(logits_np):
    logits = jnp.asarray(logits_np)

    def fn(params, x, sigma, modality):
        return jnp.broadcast_to(logits, (x.shape[0], L, V))
    return fn


def subs_np(logits, xt):
    """Reference SUBS in numpy (model.py:621-658)."""
    logits = logits.copy()
    logits[..., MASK] = -1e9
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)
                                  ).sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    p = np.exp(logp)
    unmasked = xt != MASK
    delta = np.zeros_like(p)
    np.put_along_axis(delta, xt[..., None], 1.0, axis=-1)
    return np.where(unmasked[..., None], delta, p)


def reference_ddpm_np(logits, exp_noise):
    """Numpy re-implementation of the reference ddpm loop."""
    x = np.full((B, L), MASK, np.int64)
    ts = np.linspace(1.0, EPS, STEPS + 1)
    dt = (1.0 - EPS) / STEPS
    for i in range(STEPS):
        t = ts[i]
        # loglinear: sigma = -log1p(-(1-eps_n)t); mc = 1-exp(-sigma)
        eps_n = 1e-3
        mc_t = (1 - eps_n) * t
        mc_s = (1 - eps_n) * (t - dt)
        p_x0 = subs_np(np.broadcast_to(logits, (B, L, V)).copy(), x)
        q_xs = p_x0 * (mc_t - mc_s)
        q_xs[..., MASK] = mc_s
        new = np.argmax(q_xs / exp_noise[i], axis=-1)
        x = np.where(x != MASK, x, new)
    return x


def test_ddpm_token_parity_with_injected_noise():
    rng = np.random.RandomState(0)
    logits = rng.randn(L, V).astype(np.float32) * 2
    exp_noise = rng.exponential(size=(STEPS, B, L, V)).astype(
        np.float32) + 1e-10

    cfg = config("ddpm")
    sample = jax.jit(build_sampler(fixed_forward(logits), cfg,
                                   inject_noise=True))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), bool),
                 None, {"exp": jnp.asarray(exp_noise)})
    ref = reference_ddpm_np(logits, exp_noise)
    np.testing.assert_array_equal(np.asarray(out.tokens), ref)


def reference_maskgit_np(logits, exp_noise, gumbel, r_temp=10.0,
                         mode="arccos"):
    """Numpy re-implementation of the reference maskgit loop
    (adap_sche model_eval.py:2964-3001 + _maskgit_update :3045-3114)."""
    x = np.full((B, L), MASK, np.int64)
    ts = np.linspace(1.0, EPS, STEPS + 1)
    # arccos schedule
    r = np.linspace(1, 0, STEPS)
    val = np.arccos(r) / (np.pi * 0.5)
    frac = val / val.sum()
    sche = np.round(frac[None] * L * np.ones((B, 1)))
    sche[sche == 0] = 1
    remainder = L - sche[:, :-1].sum(-1) - sche[:, -1]
    sche[:, -1] = np.maximum(sche[:, -1] + remainder, 0)
    sche = sche.astype(int)

    for i in range(STEPS):
        t = ts[i]
        copy = x != MASK
        num = np.minimum(sche[:, i], (~copy).sum(-1))
        p_x0 = subs_np(np.broadcast_to(logits, (B, L, V)).copy(), x)
        pred = np.argmax(p_x0 / exp_noise[i], axis=-1)
        conf = np.take_along_axis(p_x0, pred[..., None], -1)[..., 0]
        conf = np.log(np.maximum(conf, 1e-30)) + r_temp * gumbel[i] * t
        conf[copy] = -np.inf
        for bi in range(B):
            k = int(num[bi])
            if k <= 0:
                continue
            thresh = np.sort(conf[bi])[::-1][k - 1]
            sel = conf[bi] >= thresh
            x[bi] = np.where(sel, pred[bi], x[bi])
    return x


def test_maskgit_token_parity_with_injected_noise():
    rng = np.random.RandomState(1)
    logits = rng.randn(L, V).astype(np.float32) * 2
    exp_noise = rng.exponential(size=(STEPS, B, L, V)).astype(
        np.float32) + 1e-10
    gumbel = rng.gumbel(size=(STEPS, B, L)).astype(np.float32)

    cfg = config("maskgit")
    sample = jax.jit(build_sampler(fixed_forward(logits), cfg,
                                   inject_noise=True))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), bool),
                 None, {"exp": jnp.asarray(exp_noise),
                        "gumbel": jnp.asarray(gumbel)})
    ref = reference_maskgit_np(logits, exp_noise, gumbel)
    np.testing.assert_array_equal(np.asarray(out.tokens), ref)


def test_injection_is_deterministic():
    rng = np.random.RandomState(2)
    logits = rng.randn(L, V).astype(np.float32)
    exp_noise = rng.exponential(size=(STEPS, B, L, V)).astype(np.float32)
    cfg = config("ddpm")
    sample = jax.jit(build_sampler(fixed_forward(logits), cfg,
                                   inject_noise=True))
    outs = [np.asarray(sample(jnp.zeros(0), jax.random.PRNGKey(seed),
                              jnp.zeros((B, L), jnp.int32),
                              jnp.zeros((B, L), bool), None,
                              {"exp": jnp.asarray(exp_noise)}).tokens)
            for seed in (0, 123)]
    # different RNG keys, same injected noise -> identical tokens
    np.testing.assert_array_equal(outs[0], outs[1])
