"""Whole-sweep fused sampler for the hierarchical-logistic model.

This is the "sweep mega-kernel" step beyond the single-kernel MALA beta
update: ONE sweep of the judged config (MALA beta + conjugate mu +
conjugate inverse-gamma tau + ASIS interweaving) becomes

    3 Pallas kernels + an O(C p) jnp hyper chain

instead of ~100 XLA ops. The enabling change is the carry LAYOUT: the
group-block state (beta, carried loglik, carried grad, per-unit proposal
scales, acceptance accumulators) lives chains-minor — beta (Gp, p, C) —
and group-padded to a tile multiple ACROSS sweeps, so the per-sweep
transposes and pads of the op-by-op path disappear entirely, the
sufficient statistics for the conjugate hyper draws fall out of the MALA
kernel for free, and every remaining op in the sweep is O(C p) or O(C).

Math contract: statistically identical to the unfused sweep
(kernels/gibbs.py over models/hier_logistic.py's blocks); the jnp hyper
stage reproduces the unfused key-derivation EXACTLY (same threefry
draws), and the Pallas stages are exact-parity tested with external noise
(tests/test_fused_sweep.py). The on-core PRNG used by the MALA stage on
TPU is a different stream than threefry — same opt-in caveat as
KernelConfig.fused_accept.

Engaged via KernelConfig.fused_sweep when eligible (engine.build_step_fns);
eligibility is decided by :func:`make_fused_sweep_factory`'s product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nestmc.adapt import adapt_log_scale
from nestmc.config import MALA_TARGET_ACCEPT, SamplerConfig
from nestmc.data import NestedData
from nestmc.kernels.state import KernelState
from nestmc.ops.pallas.sweep_logistic import (
    asis_eval_t,
    asis_select_t,
    fused_mala_suff_step_t,
    pad_groups_to_multiple,
    padded_num_groups,
)


class FusedLogisticSweep:
    """Drop-in sweep implementation over a transposed, group-padded carry.

    The engine calls (in order): ``prep_data`` once, ``to_fused`` once,
    ``sweep`` per iteration inside the scans, ``collect`` per retained
    draw, and ``from_fused`` whenever a canonical-layout state is needed
    (checkpoints, accept rates, the final state).
    """

    def __init__(self, cfg: SamplerConfig, G: int, p: int,
                 prior_mu_scale: float, tau_ig_shape: float,
                 tau_ig_scale: float, tau_logprior, guard,
                 tau_logprior_grad,
                 interpret: bool = False, external_noise: bool = False,
                 dense: bool = False):
        self.cfg = cfg
        self.G, self.p = G, p
        self.Gp = padded_num_groups(G)
        self.prior_mu_scale = prior_mu_scale
        self.tau_ig_shape = tau_ig_shape
        self.tau_ig_scale = tau_ig_scale
        self._tau_logprior = tau_logprior
        self._guard = guard
        self._tau_logprior_grad = tau_logprior_grad
        self.interpret = interpret
        # dense: the pre-pad data mask is all ones, so the obs-pass
        # kernels skip per-element mask multiplies (pad rows still gated
        # by the mask-derived validity)
        self.dense = dense
        # external_noise: derive the MALA stage's noise from the SAME
        # threefry keys as the unfused kernels/mala.py path and feed it to
        # the kernel as operands — the exact-parity test mode (and the
        # only mode that works off-TPU, where the core PRNG is stubbed).
        self.external_noise = external_noise

    # ---- layout changes (once per run, not per sweep) ----

    def prep_data(self, data: NestedData) -> NestedData:
        G = self.G
        return NestedData(
            y=pad_groups_to_multiple(data.y, G),
            mask=pad_groups_to_multiple(data.mask, G),
            sizes=pad_groups_to_multiple(data.sizes, G),
            x=pad_groups_to_multiple(data.x, G),
            extra=data.extra,
        )

    def to_fused(self, state: KernelState) -> KernelState:
        G = self.G

        def padG(a):
            return pad_groups_to_multiple(a, G)

        pos = dict(state.position)
        pos["beta"] = padG(jnp.transpose(pos["beta"], (1, 2, 0)))
        pos["mu"] = pos["mu"].T
        pos["log_tau"] = pos["log_tau"].T
        cache = dict(state.cache)
        cb = cache["beta"]
        cache["beta"] = {
            "v": padG(cb["v"].T),
            "g": padG(jnp.transpose(cb["g"], (1, 2, 0))),
        }
        ls = dict(state.log_scale)
        ls["beta"] = padG(ls["beta"].T)
        acc = dict(state.accept_sum)
        acc["beta"] = padG(acc["beta"].T)
        return KernelState(
            position=pos, log_scale=ls, precond=state.precond,
            accept_sum=acc, cache=cache, t=state.t, key=state.key,
        )

    def from_fused(self, state: KernelState) -> KernelState:
        G = self.G
        pos = dict(state.position)
        pos["beta"] = jnp.transpose(pos["beta"][:G], (2, 0, 1))
        pos["mu"] = pos["mu"].T
        pos["log_tau"] = pos["log_tau"].T
        cache = dict(state.cache)
        cb = cache["beta"]
        cache["beta"] = {
            "v": cb["v"][:G].T,
            "g": jnp.transpose(cb["g"][:G], (2, 0, 1)),
        }
        ls = dict(state.log_scale)
        ls["beta"] = ls["beta"][:G].T
        acc = dict(state.accept_sum)
        acc["beta"] = acc["beta"][:G].T
        return KernelState(
            position=pos, log_scale=ls, precond=state.precond,
            accept_sum=acc, cache=cache, t=state.t, key=state.key,
        )

    def rhat_chain_axes(self) -> dict:
        """Chain-axis index of each fused position leaf (for the streaming
        full-R-hat finalize; the Welford update itself is elementwise)."""
        return {"beta": 2, "mu": 1, "log_tau": 1}

    def trim_full_rhat(self, rhat_map: dict) -> dict:
        """Drop the padded (constant-zero, R-hat 0) group rows from the
        streamed full-R-hat result."""
        out = dict(rhat_map)
        if "beta" in out:
            out["beta"] = out["beta"][: self.G]
        return out

    # ---- per-draw collection (fused layout in, canonical slices out) ----

    def collect(self, position: dict) -> dict:
        spec = self.cfg.run.collect
        items = (
            spec.items() if spec is not None
            else [("beta", None), ("mu", None), ("log_tau", None)]
        )
        out = {}
        for name, k in items:
            if name == "beta":
                v = position["beta"][: (self.G if k is None else k)]
                out[name] = jnp.transpose(v, (2, 0, 1))
            elif name in ("mu", "log_tau"):
                v = position[name].T
                out[name] = v if k is None else v[:, :k]
            else:
                raise KeyError(
                    f"fused sweep cannot collect {name!r}; available: "
                    "beta, mu, log_tau"
                )
        return out

    # ---- the sweep ----

    def _mala_noise(self, kr, dtype):
        """Threefry noise identical to the unfused kernels/mala.py draw
        order, transposed+padded into kernel layout (parity-test mode)."""
        C, G, p = self._C, self.G, self.p
        k_eps, k_u = jax.random.split(kr)
        eps = jax.random.normal(k_eps, (C, G, p), dtype)
        logu = jnp.log(jax.random.uniform(
            k_u, (C, G), dtype, minval=jnp.finfo(dtype).tiny
        ))
        return (
            pad_groups_to_multiple(jnp.transpose(eps, (1, 2, 0)), G),
            pad_groups_to_multiple(logu.T, G),
        )

    def sweep(self, state: KernelState, data, adapt: bool) -> KernelState:
        cfg = self.cfg
        G, p = self.G, self.p
        key, key_sweep = jax.random.split(state.key)
        pos = dict(state.position)
        ls = dict(state.log_scale)
        acc_sum = dict(state.accept_sum)
        cache = dict(state.cache)
        t = state.t

        beta, mu, lt = pos["beta"], pos["mu"], pos["log_tau"]
        v, g = cache["beta"]["v"], cache["beta"]["g"]
        self._C = beta.shape[-1]
        dtype = beta.dtype
        itau2 = jnp.exp(-2.0 * lt)                        # (p, C)

        # --- beta: fused MALA + suff stats (block index 0, repeat 0;
        #     key derivation mirrors kernels/gibbs.py:54,79) ---
        kr = jax.random.fold_in(jax.random.fold_in(key_sweep, 0), 0)
        noise = self._mala_noise(kr, dtype) if self.external_noise else None
        beta, v, g, alpha_b, s1, s2 = fused_mala_suff_step_t(
            kr, beta, v, g, ls["beta"], mu, itau2,
            data.x, data.y, data.mask,
            interpret=self.interpret, noise=noise, dense=self.dense,
        )
        acc_sum["beta"] = acc_sum["beta"] + alpha_b
        if adapt:
            ls["beta"] = adapt_log_scale(
                ls["beta"], alpha_b, t, MALA_TARGET_ACCEPT, cfg.kernel
            )

        # --- mu: exact conjugate draw from the kernel's suff stats
        #     (models/hier_logistic.py gibbs_mu, transposed) ---
        kb = jax.random.fold_in(key_sweep, 1)
        prec = G * itau2 + 1.0 / self.prior_mu_scale**2   # (p, C)
        mean = s1 * itau2 / prec
        eps_mu = jax.random.normal(kb, (self._C, p), dtype).T
        mu = mean + eps_mu / jnp.sqrt(prec)
        acc_sum["mu"] = acc_sum["mu"] + 1.0

        # --- log_tau: exact conjugate inverse-gamma draw
        #     (models/hier_logistic.py gibbs_log_tau, transposed) ---
        kb2 = jax.random.fold_in(key_sweep, 2)
        quad = s2 - 2.0 * mu * s1 + G * mu * mu
        a = self.tau_ig_shape + 0.5 * G
        b = self.tau_ig_scale + 0.5 * quad
        gsamp = jax.random.gamma(kb2, a, shape=(self._C, p), dtype=dtype).T
        lt = jnp.clip(0.5 * (jnp.log(b) - jnp.log(gsamp)), -12.0, 12.0)
        acc_sum["log_tau"] = acc_sum["log_tau"] + 1.0

        # --- ASIS interweaving move (models/hier_logistic.py
        #     asis_tau_move; key path kernels/gibbs.py:110,113).
        #     LANGEVIN, mirroring the unfused grad-mode move: the drift at
        #     the current point reads the CARRIED likelihood gradient g
        #     (sum_g g . (beta - mu) is an O(Gp p C) elementwise-reduce,
        #     XLA-side — no extra obs pass), the drift at the proposal
        #     reads asis_eval_t's g_new output. ---
        km = jax.random.fold_in(key_sweep, 1000)
        kmr = jax.random.fold_in(km, 0)
        k1, k2 = jax.random.split(kmr)
        eps_a = jax.random.normal(k1, (self._C, p), dtype).T   # (p, C)
        scale_asis = jnp.exp(ls["asis_tau"]).T                 # (1, C)
        s2_asis = scale_asis * scale_asis
        diff = beta - mu[None]                                 # (Gp, p, C)
        g_lt = (
            jnp.sum(g * diff, axis=0) + self._tau_logprior_grad(lt)
        )                                                      # (p, C)
        lt_prop = lt + 0.5 * s2_asis * g_lt + scale_asis * eps_a
        ratio = jnp.exp(lt_prop - lt)                          # (p, C)
        prior_delta = jnp.sum(
            self._tau_logprior(lt_prop) + self._guard(lt_prop)
            - self._tau_logprior(lt),
            axis=0,
        )                                                      # (C,)
        logu = jnp.log(jax.random.uniform(
            k2, (self._C,), dtype, minval=jnp.finfo(dtype).tiny
        ))
        # Measured A/B at C=256 (sample sweeps/s): this eval+select
        # composition 1679 vs a single-launch merged ASIS kernel 1521 —
        # the merged kernel's second pass refetched the carry blocks and
        # its full-Gp VMEM scratch forced TC=128, costing more than the
        # launch it saved, so the merged variant was removed in round 3
        # (decision + revisit condition recorded in DESIGN.md §4a).
        lik_new, g_new, dsum = asis_eval_t(
            beta, v, mu, ratio, data.x, data.y, data.mask,
            interpret=self.interpret, dense=self.dense,
        )
        g_lt_new = (
            jnp.sum(g_new * diff * ratio[None], axis=0)
            + self._tau_logprior_grad(lt_prop)
        )                                                      # (p, C)
        fwd = lt_prop - lt - 0.5 * s2_asis * g_lt
        rev = lt - lt_prop - 0.5 * s2_asis * g_lt_new
        q_corr = jnp.sum(fwd * fwd - rev * rev, axis=0) / (
            2.0 * s2_asis[0]
        )                                                      # (C,)
        log_alpha = dsum[0] + prior_delta + q_corr
        accept = logu < log_alpha                              # NaN -> F
        beta, v, g = asis_select_t(
            beta, v, g, lik_new, g_new, mu, ratio,
            accept.astype(dtype)[None, :], data.mask,
            interpret=self.interpret,
        )
        lt = jnp.where(accept[None, :], lt_prop, lt)
        alpha_a = jnp.where(
            jnp.isnan(log_alpha), 0.0,
            jnp.exp(jnp.minimum(log_alpha, 0.0)),
        )[:, None]                                             # (C, 1)
        acc_sum["asis_tau"] = acc_sum["asis_tau"] + alpha_a
        if adapt:
            # MALA target: the factory only engages for algorithm='mala',
            # where the unfused path's 'auto' resolves to the same
            ls["asis_tau"] = adapt_log_scale(
                ls["asis_tau"], alpha_a, t, MALA_TARGET_ACCEPT, cfg.kernel
            )

        pos["beta"], pos["mu"], pos["log_tau"] = beta, mu, lt
        cache["beta"] = {"v": v, "g": g}
        return KernelState(
            position=pos, log_scale=ls, precond=state.precond,
            accept_sum=acc_sum, cache=cache, t=t + 1, key=key,
        )


def make_fused_sweep_factory(G, p, prior_mu_scale, tau_ig_shape,
                             tau_ig_scale, tau_logprior, guard,
                             tau_logprior_grad):
    """ModelSpec.fused_sweep hook for the invgamma-tau hierarchical
    logistic model over padded data. Returns None when the config is
    outside the fused sweep's envelope (the engine then runs the op-by-op
    sweep, which covers every configuration)."""

    def factory(cfg: SamplerConfig, data, interpret: bool | None = None,
                external_noise: bool = False):
        k = cfg.kernel
        if not (
            k.algorithm == "mala"
            and k.precond == "none"
            and k.scale_per_unit
            and cfg.sharding.group_shards == 1
            and cfg.run.chains % 8 == 0
            and isinstance(data, NestedData)
        ):
            return None
        if interpret is None:
            if jax.default_backend() != "tpu":
                # the on-core PRNG is stubbed off-TPU; only the external-
                # noise test mode is valid there
                if not external_noise:
                    return None
                interpret = True
            else:
                interpret = False
        collect = cfg.run.collect
        if collect is not None and any(
            name not in ("beta", "mu", "log_tau") for name in collect
        ):
            return None
        import numpy as np

        return FusedLogisticSweep(
            cfg, G, p, prior_mu_scale, tau_ig_shape, tau_ig_scale,
            tau_logprior, guard, tau_logprior_grad,
            interpret=interpret, external_noise=external_noise,
            dense=bool(np.asarray(data.mask).all()),
        )

    return factory
