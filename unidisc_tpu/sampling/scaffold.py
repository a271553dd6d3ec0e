"""Scaffold decoding: per-step MODEL-SIZE scheduling inside one scan.

Measured result (BASELINE.md, scripts/scaffold_ab.py on v5e-1): running
the FIRST `split` denoise steps on the big trunk and the remainder on a
much smaller trunk reaches 97% of big-only accuracy (with BETTER
model-NLL) at 26% of the compute at split=8/32 — while the reverse
ordering collapses. The early structure-setting reveals need the full
model; late refinement doesn't.

TPU-native realization: both models share vocab/length, so ONE forward
closure dispatches with `lax.cond` on sigma (monotone in t) and the
EXISTING scan samplers run unchanged — params are the tuple
(params_big, params_small), no host round-trips, one compiled program.

No reference counterpart (the reference samples one model per run).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.noise import get_noise


def sigma_boundary(config: Config, split: int,
                   num_steps: Optional[int] = None) -> float:
    """Noise level at the step-`split` boundary: steps [0, split) run
    at sigma ABOVE this value (timesteps are linspace(1, eps, N+1))."""
    steps = num_steps or config.sampling.steps
    if split >= steps:
        return -1.0  # everything is "early"
    timesteps = np.linspace(1.0, config.sampling.sampling_eps, steps + 1)
    noise = get_noise(config.noise)
    t = max(float(timesteps[split]), 1e-6)
    return float(np.asarray(noise.total(jax.numpy.asarray(t))))


def build_scaffold_forward(forward_big: Callable, forward_small: Callable,
                           config: Config, *, split: int,
                           num_steps: Optional[int] = None) -> Callable:
    """forward_logits closure: steps [0, split) -> BIG model, the rest
    -> small (the measured-good big-early/small-late ordering).

    forward_*: (params, x, sigma, modality) -> logits with IDENTICAL
    output shape (shared vocab + length). The returned closure takes
    params = (params_big, params_small).

    CONTRACT: sigma must be batch-UNIFORM (lockstep samplers — every
    row at the same denoise step); the dispatch is one lax.cond on
    sigma[0] for the whole batch. Per-row ragged sigmas (the rolling
    batcher) are NOT supported: a per-row model choice would have to
    run BOTH trunks every step, erasing the compute saving — the
    engine routes scaffold requests to the whole-batch path instead
    (serving/engine.py run_batch)."""
    sig_b = sigma_boundary(config, split, num_steps)

    def forward(params: Tuple, x, sigma, modality):
        pb, ps = params
        return jax.lax.cond(
            sigma[0] > sig_b + 1e-8,
            lambda _: forward_big(pb, x, sigma, modality),
            lambda _: forward_small(ps, x, sigma, modality), None)

    return forward


def build_scaffold_sampler(model_big, model_small, config: Config, *,
                           split: int,
                           num_steps: Optional[int] = None) -> Callable:
    """build_sampler over the scaffold forward.

    sample((params_big, params_small), rng, x0, unmask, modality)."""
    from unidisc_tpu.sampling.sampler import build_sampler

    def fwd(model):
        return lambda p, x, s, m: model.apply({"params": p}, x, s,
                                              modality=m)

    forward = build_scaffold_forward(fwd(model_big), fwd(model_small),
                                     config, split=split,
                                     num_steps=num_steps)
    return build_sampler(forward, config, num_steps=num_steps)
