"""Noise schedules for absorbing-state masked diffusion.

Pure-function re-design of the reference's ``nn.Module`` schedule classes
(reference: models/noise_schedule.py:13-157). Each schedule is a frozen
dataclass with jit-friendly ``total`` / ``rate`` methods:

  total(t)  = sigma(t)  = \\int_0^t g(s) ds   (total noise)
  rate(t)   = g(t)                             (instantaneous rate)

The default LogLinear schedule gives move_chance = 1 - exp(-sigma) = (1-eps)*t.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from unidisc_tpu.config import NoiseConfig


@dataclass(frozen=True)
class LogLinearNoise:
    """sigma(t) = -log1p(-(1-eps) t) (reference: noise_schedule.py:128-157)."""

    eps: float = 1e-3

    def total(self, t):
        return -jnp.log1p(-(1 - self.eps) * t)

    def rate(self, t):
        return (1 - self.eps) / (1 - (1 - self.eps) * t)

    @property
    def sigma_max(self):
        import math
        return -math.log1p(-(1 - self.eps))

    @property
    def sigma_min(self):
        return self.eps

    def importance_sampling_transformation(self, t):
        f_t = jnp.log1p(-jnp.exp(-self.sigma_max))
        f_0 = jnp.log1p(-jnp.exp(-self.sigma_min))
        sigma_t = -jnp.log1p(-jnp.exp(t * f_t + (1 - t) * f_0))
        return -jnp.expm1(-sigma_t) / (1 - self.eps)


@dataclass(frozen=True)
class CosineNoise:
    """(reference: noise_schedule.py:60-74)"""

    eps: float = 1e-3

    def total(self, t):
        cos = jnp.cos(t * jnp.pi / 2)
        return -jnp.log(self.eps + (1 - self.eps) * cos)

    def rate(self, t):
        cos = (1 - self.eps) * jnp.cos(t * jnp.pi / 2)
        sin = (1 - self.eps) * jnp.sin(t * jnp.pi / 2)
        return (jnp.pi / 2) * sin / (cos + self.eps)


@dataclass(frozen=True)
class CosineSqrNoise:
    """(reference: noise_schedule.py:77-91)"""

    eps: float = 1e-3

    def total(self, t):
        cos = jnp.cos(t * jnp.pi / 2) ** 2
        return -jnp.log(self.eps + (1 - self.eps) * cos)

    def rate(self, t):
        cos = (1 - self.eps) * (jnp.cos(t * jnp.pi / 2) ** 2)
        sin = (1 - self.eps) * jnp.sin(t * jnp.pi)
        return (jnp.pi / 2) * sin / (cos + self.eps)


@dataclass(frozen=True)
class LinearNoise:
    """sigma(t) = sigma_min + t (sigma_max - sigma_min) (reference: noise_schedule.py:94-110)."""

    sigma_min: float = 0.0
    sigma_max: float = 10.0

    def total(self, t):
        return self.sigma_min + t * (self.sigma_max - self.sigma_min)

    def rate(self, t):
        return jnp.full_like(jnp.asarray(t, jnp.float32), self.sigma_max - self.sigma_min)

    def importance_sampling_transformation(self, t):
        f_t = jnp.log1p(-jnp.exp(-self.sigma_max))
        f_0 = jnp.log1p(-jnp.exp(-self.sigma_min))
        sigma_t = -jnp.log1p(-jnp.exp(t * f_t + (1 - t) * f_0))
        return (sigma_t - self.sigma_min) / (self.sigma_max - self.sigma_min)


@dataclass(frozen=True)
class GeometricNoise:
    """sigma(t) = sigma_min^(1-t) sigma_max^t (reference: noise_schedule.py:113-123)."""

    sigma_min: float = 1e-3
    sigma_max: float = 1.0

    def total(self, t):
        return self.sigma_min ** (1 - t) * self.sigma_max ** t

    def rate(self, t):
        return self.total(t) * (jnp.log(self.sigma_max) - jnp.log(self.sigma_min))


def get_noise(cfg: NoiseConfig):
    """Schedule factory (reference: noise_schedule.py:13-28)."""
    if cfg.type == "loglinear":
        return LogLinearNoise(eps=cfg.eps)
    if cfg.type == "cosine":
        return CosineNoise(eps=cfg.eps)
    if cfg.type == "cosinesqr":
        return CosineSqrNoise(eps=cfg.eps)
    if cfg.type == "linear":
        return LinearNoise(sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max)
    if cfg.type == "geometric":
        return GeometricNoise(sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max)
    raise ValueError(f"{cfg.type} is not a valid noise schedule")
