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


class _RecordingState(dict):
    """State dict that records which blocks the simulator reads."""

    def __init__(self, base):
        super().__init__(base)
        self.accessed: set = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def _blocks_read(model, draws, data):
    """Names of retained blocks that ``model.sample_data`` actually reads.

    Probes the simulator once with zero-valued (1, ...)-shaped entries; the
    recorded key accesses let ``posterior_predictive`` drop unread blocks,
    so partially collected blocks the simulator never touches don't force
    full collection (VERDICT r2 item 10).
    """
    probe = _RecordingState({
        n: jnp.zeros((1,) + v.shape[2:], v.dtype) for n, v in draws.items()
    })
    try:
        jax.eval_shape(
            lambda k: model.sample_data(k, probe, data), jax.random.key(0)
        )
    except Exception:
        # a shape error here means a READ block is partially collected;
        # the informative error is raised by the caller with the names
        pass
    return probe.accessed or set(draws)


def posterior_predictive(model, post, data, key=None, num: int = 64):
    """Simulate ``num`` replicated response arrays from posterior draws.

    Draws (chain, draw) indices uniformly, rebuilds single-chain states
    from the retained draws, and runs ``model.sample_data`` over all
    replicates as ONE jitted vmap (no host loop, no per-replicate
    dispatch).

    Blocks that ``sample_data`` reads must be FULLY collected
    (``RunConfig.collect`` None or full entries for those blocks); blocks
    it does not read may be partially collected or absent.

    Returns a stacked array of replicated responses: (num, G, n) for
    padded data (masked entries zeroed by the simulator's convention),
    (num, N_obs) for ragged data.
    """
    if model.sample_data is None:
        raise ValueError(f"model {model.name!r} has no sample_data hook")
    if key is None:
        key = jax.random.key(0)
    if not post.draws:
        raise ValueError("no retained draws to predict from")
    needed = _blocks_read(model, post.draws, data)
    draws = {n: v for n, v in post.draws.items() if n in needed}
    names = list(draws)
    C, D = draws[names[0]].shape[:2]
    k_idx, k_sim = jax.random.split(key)
    kc, kd = jax.random.split(k_idx)
    cs = jax.random.randint(kc, (num,), 0, C)
    ds = jax.random.randint(kd, (num,), 0, D)
    sim_keys = jax.random.split(k_sim, num)

    @jax.jit
    def replicate(c, d, k):
        state = {
            name: draws[name][c, d][None]  # singleton chain axis
            for name in names
        }
        return model.sample_data(k, state, data).y

    try:
        return jax.vmap(replicate)(cs, ds, sim_keys)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"posterior_predictive: model {model.name!r} reads blocks "
            f"{sorted(needed)}; each must be fully collected "
            "(RunConfig.collect None or the full unit count) — partial "
            f"collection breaks the simulator shapes: {e}"
        ) from e


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
