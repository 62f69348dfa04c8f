"""Generic hierarchical GLM families: posterior recovery of true params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.models.hier_glm import make_hier_glm, synth_glm


_AUX = {"gaussian": "log_sigma", "negbin": "log_r"}


@pytest.mark.parametrize("family", ["gaussian", "binomial", "poisson",
                                    "negbin"])
@pytest.mark.slow
def test_glm_recovers_truth(family):
    data, truth = synth_glm(
        jax.random.key(1), family=family, G=60, n=25, p=3
    )
    model = make_hier_glm(data, family=family)
    aux = _AUX.get(family)
    collect = {"mu": None, "log_tau": None}
    if aux:
        collect[aux] = None
    cfg = SamplerConfig(
        run=RunConfig(
            chains=16, warmup=800, draws=800, seed=2,
            log_every_segment=False, collect=collect,
        ),
    )
    post = sample(model, data, cfg)
    assert post.worst_rhat() < 1.06  # modest run, sane convergence

    mu_hat = np.asarray(post.mean("mu"))
    mu_sd = np.asarray(post.diagnostics()["mu"]["sd"])
    assert np.all(
        np.abs(mu_hat - np.asarray(truth["mu"])) < 4 * mu_sd + 0.1
    ), (mu_hat, truth["mu"])

    if family == "gaussian":
        sig_hat = float(jnp.exp(post.draws["log_sigma"]).mean())
        assert abs(sig_hat - truth["sigma"]) < 0.1, sig_hat
        # sigma is a data-dependent population block: acceptance adapted
        acc = float(post.accept_rates["log_sigma"].mean())
        assert 0.3 < acc < 0.6, acc
    if family == "negbin":
        # concentration r recovered within a loose factor (r is weakly
        # identified at n=25 obs/group)
        r_hat = float(jnp.exp(post.draws["log_r"]).mean())
        assert 0.3 * truth["r"] < r_hat < 3.0 * truth["r"], r_hat


def test_glm_unknown_family_rejected():
    data, _ = synth_glm(jax.random.key(1), family="gaussian", G=4, n=3)
    with pytest.raises(ValueError, match="family"):
        make_hier_glm(data, family="weibull")
