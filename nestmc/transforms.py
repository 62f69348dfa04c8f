"""Bijective reparameterizations for constrained parameters.

The sampler works entirely in unconstrained space; constrained parameters
(scales > 0, probabilities in (0,1)) are mapped through these bijectors and
their log-Jacobians are added to the target log-density, so random-walk
proposals never leave the support.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
from jax import nn


@dataclass(frozen=True)
class Transform:
    """y = forward(x): unconstrained x -> constrained y.

    ``log_jac(x)`` is log |dy/dx| elementwise, to be ADDED to the target
    density written in terms of the constrained variable.
    """

    name: str
    forward: Callable
    inverse: Callable
    log_jac: Callable


identity = Transform(
    name="identity",
    forward=lambda x: x,
    inverse=lambda y: y,
    log_jac=lambda x: jnp.zeros_like(x),
)

# exp: x in R -> y > 0;  log|dy/dx| = x
log_transform = Transform(
    name="log",
    forward=jnp.exp,
    inverse=jnp.log,
    log_jac=lambda x: x,
)

# sigmoid: x in R -> y in (0,1); log|dy/dx| = -softplus(x) - softplus(-x)
logit_transform = Transform(
    name="logit",
    forward=nn.sigmoid,
    inverse=lambda y: jnp.log(y) - jnp.log1p(-y),
    log_jac=lambda x: -nn.softplus(x) - nn.softplus(-x),
)

# softplus: x in R -> y > 0; log|dy/dx| = log(sigmoid(x)) = -softplus(-x)
softplus_transform = Transform(
    name="softplus",
    forward=nn.softplus,
    inverse=lambda y: jnp.log(-jnp.expm1(-y)) + y,
    log_jac=lambda x: -nn.softplus(-x),
)

TRANSFORMS = {
    t.name: t
    for t in (identity, log_transform, logit_transform, softplus_transform)
}


def get(name: str) -> Transform:
    return TRANSFORMS[name]
