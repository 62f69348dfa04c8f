"""Posterior-predictive simulation — model checking for nested data.

Replicated datasets y_rep ~ p(y | theta^(s)) at posterior draws theta^(s)
(Gelman et al., BDA3 ch. 6): compare observed statistics against the
replicated distribution. Reuses the model's ``sample_data`` hook (the same
simulator that powers the Geweke/SBC calibration tiers), so every built-in
model with a simulator gets predictive checks for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def posterior_predictive(model, post, data, key=None, num: int = 64):
    """Simulate ``num`` replicated response arrays from posterior draws.

    Draws (chain, draw) indices uniformly, rebuilds a single-chain state
    from the retained draws, and runs ``model.sample_data`` per replicate
    (a Python loop — replicates are few and each simulation is one cheap
    elementwise pass).

    Requires every block that ``sample_data`` reads to be FULLY collected
    (``RunConfig.collect`` None or full entries for those blocks); partial
    unit collection raises a shape error inside the simulator.

    Returns a stacked array of replicated responses: (num, G, n) for
    padded data (masked entries zeroed by the simulator's convention),
    (num, N_obs) for ragged data.
    """
    if model.sample_data is None:
        raise ValueError(f"model {model.name!r} has no sample_data hook")
    if key is None:
        key = jax.random.key(0)
    names = list(post.draws)
    if not names:
        raise ValueError("no retained draws to predict from")
    C, D = post.draws[names[0]].shape[:2]
    k_idx, k_sim = jax.random.split(key)
    kc, kd = jax.random.split(k_idx)
    cs = jax.random.randint(kc, (num,), 0, C)
    ds = jax.random.randint(kd, (num,), 0, D)
    sim_keys = jax.random.split(k_sim, num)

    @jax.jit
    def one(c, d, k):
        state = {
            name: post.draws[name][c, d][None]  # singleton chain axis
            for name in names
        }
        return model.sample_data(k, state, data).y

    reps = [one(cs[i], ds[i], sim_keys[i]) for i in range(num)]
    return jnp.stack(reps, axis=0)


def predictive_pvalue(y_rep, data, stat=None):
    """Posterior-predictive p-value of a test statistic.

    stat: fn(y, mask_or_None) -> scalar or array; default = masked mean.
    Returns P(stat(y_rep) >= stat(y_obs)) estimated over replicates —
    values near 0 or 1 flag misfit in that statistic.
    """
    mask = getattr(data, "mask", None)

    if stat is None:
        if mask is not None:
            def stat(y, m):
                return jnp.sum(y * m) / jnp.sum(m)
        else:
            def stat(y, m):
                return jnp.mean(y)

    obs = stat(data.y, mask)
    reps = jnp.stack([stat(y, mask) for y in y_rep])
    return jnp.mean((reps >= obs).astype(jnp.float32), axis=0)
