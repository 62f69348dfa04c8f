"""Fused Pallas TPU kernels for the hot likelihood reductions.

Each kernel has an identical-signature jnp reference in nestmc/ops/loglik.py
and a parity test (tests/test_pallas_parity.py). On CPU the kernels run in
interpreter mode (tests); on TPU they compile via Mosaic.

Why kernels at all: XLA fuses the einsum+elementwise+reduce chain well, but
the Pallas versions control the VMEM tiling over the chains x groups x obs
lattice explicitly — the observation axis streams through VMEM tiles and the
(C, G) log-likelihood accumulates in f32 without materializing the
(C, G, n) eta tensor in HBM at large G.
"""

from nestmc.ops.pallas.loglik_logistic import (
    logistic_loglik_padded_pallas,
    logistic_logp_grad_pallas,
)
from nestmc.ops.pallas.loglik_poisson import (
    poisson_loglik_padded_pallas,
    poisson_logp_grad_pallas,
)

__all__ = [
    "logistic_loglik_padded_pallas",
    "logistic_logp_grad_pallas",
    "poisson_loglik_padded_pallas",
    "poisson_logp_grad_pallas",
]
