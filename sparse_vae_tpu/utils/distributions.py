"""Diagonal Gaussian distribution as an explicit pytree.

TPU-native stand-in for the reference's `torch.distributions.Normal` usage
(e.g. /root/reference/sparse_vae/core/conditional_gaussian.py:26). A NamedTuple
of (loc, scale) arrays is jit/vmap/shard-transparent, unlike a distribution
object with Python-side state.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class DiagonalGaussian(NamedTuple):
    loc: jax.Array
    scale: jax.Array

    @property
    def variance(self):
        return jnp.square(self.scale)

    def sample(self, rng, sample_shape=()):
        """Reparameterized sample (rsample): loc + scale * eps."""
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(rng, shape, dtype=self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, x):
        """Elementwise log N(x; loc, scale^2)."""
        z = (x - self.loc) / self.scale
        return -0.5 * jnp.square(z) - jnp.log(self.scale) - _LOG_SQRT_2PI


def gaussian_from_params(mu, logvar):
    """(mu, logvar) -> DiagonalGaussian with scale = exp(logvar/2).

    Like the reference (conditional_gaussian.py:20-26) we do not clamp or
    validate: scale == 0 produces inf log-probs/KL, which under bf16 training
    surfaces as a non-finite loss the trainer can detect (no AMP grad scaler
    on TPU — bf16 needs none).
    """
    return DiagonalGaussian(loc=mu, scale=jnp.exp(0.5 * logvar))


def standard_normal_kl(mu, logvar):
    """Elementwise analytic KL(N(mu, var) || N(0, 1)) = 0.5(mu^2+var-logvar-1).

    Same formula as conditional_gaussian.py:27.
    """
    return 0.5 * (jnp.square(mu) + jnp.exp(logvar) - logvar - 1.0)


def standard_normal_log_prob(z):
    """log N(z; 0, I) summed over the last axis
    (continuous_autoencoder.py:55-57)."""
    d = z.shape[-1]
    return -0.5 * jnp.sum(jnp.square(z), axis=-1) - _LOG_SQRT_2PI * d


def kl_divergence(p: DiagonalGaussian, q: DiagonalGaussian):
    """Elementwise KL(p || q) for diagonal Gaussians."""
    var_ratio = jnp.square(p.scale / q.scale)
    t1 = jnp.square((p.loc - q.loc) / q.scale)
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
