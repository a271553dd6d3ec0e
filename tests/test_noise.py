"""Golden-value tests for noise schedules vs hand-computed cases
(reference semantics: models/noise_schedule.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.config import NoiseConfig
from unidisc_tpu.diffusion import get_noise, LogLinearNoise


def test_loglinear_golden():
    n = LogLinearNoise(eps=1e-3)
    t = jnp.array([0.0, 0.25, 0.5, 0.9, 1.0])
    sigma = np.asarray(n.total(t), dtype=np.float64)
    # sigma(t) = -log1p(-(1-eps) t)
    expected = -np.log1p(-(1 - 1e-3) * np.asarray(t, np.float64))
    np.testing.assert_allclose(sigma, expected, rtol=1e-3, atol=1e-6)
    # move_chance = 1 - exp(-sigma) = (1-eps) t
    np.testing.assert_allclose(1 - np.exp(-sigma), (1 - 1e-3) * np.asarray(t, np.float64),
                               rtol=1e-3, atol=1e-6)


def test_loglinear_rate_is_derivative():
    # fp64 numpy finite difference as the golden value (fp32 jax output)
    eps = 1e-3
    n = LogLinearNoise(eps=eps)
    t64 = np.linspace(0.05, 0.95, 19)
    h = 1e-6
    numeric = (-np.log1p(-(1 - eps) * (t64 + h)) + np.log1p(-(1 - eps) * (t64 - h))) / (2 * h)
    rate = np.asarray(n.rate(jnp.asarray(t64, jnp.float32)), np.float64)
    np.testing.assert_allclose(rate, numeric, rtol=1e-4)


@pytest.mark.parametrize("kind", ["loglinear", "cosine", "cosinesqr", "linear", "geometric"])
def test_all_schedules_monotone(kind):
    n = get_noise(NoiseConfig(type=kind))
    t = jnp.linspace(0.01, 0.99, 50)
    sigma = np.asarray(n.total(t))
    assert np.all(np.diff(sigma) > 0), f"{kind} total noise must be increasing"
    assert np.all(np.asarray(n.rate(t)) > 0), f"{kind} rate must be positive"


def test_importance_sampling_transform_endpoints():
    n = LogLinearNoise(eps=1e-3)
    t = jnp.array([0.0, 1.0])
    out = np.asarray(n.importance_sampling_transformation(t))
    # maps [0,1] -> [~0, ~1]
    np.testing.assert_allclose(out, [0.001, 1.0], atol=5e-3)
