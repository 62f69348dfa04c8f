"""Hot likelihood reductions over the chains x groups x observations lattice.

``nestmc.ops.loglik`` holds the pure-jnp reference implementations (always
correct, used for tests and as CPU fallback); ``nestmc.ops.pallas`` holds the
fused Pallas TPU kernels with identical signatures and parity tests.
"""

from nestmc.ops.loglik import (
    logistic_loglik_padded,
    logistic_loglik_segment,
    normal_loglik_padded,
    poisson_loglik_padded,
    poisson_loglik_segment,
)

__all__ = [
    "logistic_loglik_padded",
    "logistic_loglik_segment",
    "normal_loglik_padded",
    "poisson_loglik_padded",
    "poisson_loglik_segment",
]
