"""Built-in hierarchical model families (BASELINE.json:7-11 configs).

Every maker returns (ModelSpec, NestedData-like) or just the ModelSpec when
the caller supplies data. All built-ins are written chain-batched (every
state leaf has a leading ``chains`` axis) so the hot likelihood reductions
see the chain axis explicitly — see nestmc/model.py docstring.
"""

from nestmc.models.conjugate import (
    analytic_hier_normal_posterior,
    make_hier_normal_known_scales,
    synth_hier_normal,
)
from nestmc.models.eight_schools import eight_schools_data, make_eight_schools
from nestmc.models.hier_glm import make_hier_glm, synth_glm
from nestmc.models.hier_logistic import make_hier_logistic, synth_logistic
from nestmc.models.nested_poisson import make_nested_poisson, synth_poisson3

__all__ = [
    "analytic_hier_normal_posterior",
    "eight_schools_data",
    "make_eight_schools",
    "make_hier_glm",
    "make_hier_logistic",
    "make_hier_normal_known_scales",
    "make_nested_poisson",
    "synth_glm",
    "synth_hier_normal",
    "synth_logistic",
    "synth_poisson3",
]
