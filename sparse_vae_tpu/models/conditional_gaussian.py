"""Gaussian posterior head.

Flax port of /root/reference/sparse_vae/core/conditional_gaussian.py: a single
Dense producing (mu, logvar), returning a DiagonalGaussian and optionally the
analytic standard-normal KL 0.5(mu^2 + var - logvar - 1) (:27). As in the
reference (:22-25) nothing is clamped — a degenerate scale yields inf KL and
a non-finite loss the trainer can see.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..utils.distributions import (DiagonalGaussian, gaussian_from_params,
                                   standard_normal_kl)
from .base import dense_kernel_init


class ConditionalGaussian(nn.Module):
    out_features: int
    zero_initialized: bool = False
    use_bias: bool = True
    init_scale: Optional[float] = 0.02

    @nn.compact
    def __call__(self, x, get_kl: bool = False):
        kernel_init = (nn.initializers.zeros if self.zero_initialized
                       else dense_kernel_init(self.init_scale))
        params = nn.Dense(self.out_features * 2, use_bias=self.use_bias,
                          kernel_init=kernel_init, name="linear")(x)
        mu, logvar = jnp.split(params, 2, axis=-1)
        gaussian = gaussian_from_params(mu, logvar)
        if get_kl:
            return gaussian, standard_normal_kl(mu, logvar)
        return gaussian
