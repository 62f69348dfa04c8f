"""One-step exactness of nested_poisson's Langevin interweaving moves.

Same contract as tests/test_asis_grad.py: the move's acceptance
probability is reproduced independently from the public joint density.
For the (tau_g, beta_g) interweave with z_g = (beta_g - mu)/tau_g fixed,

    F(lt') = joint({beta_g: mu + e^{lt'} z_g, log_tau_g: lt'})
             + G * sum_k lt'_k

(beta_s fixed, so the obs likelihood cancels in differences; the
group-prior + Jacobian term is constant by construction). The tau_s
analog uses S * sum_k lt'_k and rescales beta_s about its group means.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.models.nested_poisson import make_nested_poisson, synth_poisson3

C = 8


def _setup(tau_prior):
    data, _ = synth_poisson3(
        jax.random.key(7), G=12, subjects_per_group=4, n=6, p=3
    )
    model = make_nested_poisson(
        data, loglik_impl="jnp", tau_prior=tau_prior
    )
    position = model.init_state(jax.random.key(8), data, C)
    return data, model, position


def _mala_ref(F, lt, scale, key):
    """Reference MALA acceptance on target F from the same key split."""
    gF = jax.grad(lambda v: jnp.sum(F(v)))
    k1, _ = jax.random.split(key)
    eps = jax.random.normal(k1, lt.shape, lt.dtype)
    s = scale
    g_old = gF(lt)
    lt_new = lt + 0.5 * s * s * g_old + s * eps
    g_new = gF(lt_new)
    fwd = lt_new - lt - 0.5 * s * s * g_old
    rev = lt - lt_new - 0.5 * s * s * g_new
    log_alpha = (
        F(lt_new) - F(lt)
        + jnp.sum(fwd * fwd - rev * rev, axis=-1) / (2.0 * s[:, 0] ** 2)
    )
    return jnp.exp(jnp.minimum(log_alpha, 0.0))


@pytest.mark.parametrize("tau_prior", ["halfnormal", "invgamma"])
def test_laplace_asis_tau_g_matches_autodiff(tau_prior):
    """asis_tau_g is a parameter-free LAPLACE proposal (analytic gradient
    and diagonal Gauss-Newton metric, no data touch) — validate the
    gradient against autodiff of the target, the metric against jvp
    Jacobians of the rescale map, and the full q ratio."""
    data, model, position = _setup(tau_prior)
    G = data.num_groups
    p = position["log_tau_g"].shape[-1]
    key = jax.random.key(21)
    scale = jnp.full((C, 1), 0.08, jnp.float32)  # ignored (Laplace)
    pos_up, _, alpha = model.joint_moves["asis_tau_g"](
        key, position, {}, scale, data
    )

    bg, mu, lt0 = (
        position["beta_g"], position["mu"], position["log_tau_g"],
    )
    tau_z = bg - mu[:, None, :]
    inv_ts2 = jnp.exp(-2.0 * position["log_tau_s"])      # (C, p)

    def F(lt):
        bg_p = mu[:, None, :] + tau_z * jnp.exp(lt - lt0)[:, None, :]
        st = {**position, "beta_g": bg_p, "log_tau_g": lt}
        return model.joint_logdensity(st, data) + G * jnp.sum(lt, axis=-1)

    gF = jax.grad(lambda v: jnp.sum(F(v)))

    def bg_s_of(lt):
        bg_p = mu[:, None, :] + tau_z * jnp.exp(lt - lt0)[:, None, :]
        return jnp.take(bg_p, data.subject_group, axis=1)  # (C, S, p)

    def metric(lt):
        # GN metric via jvp Jacobians of the subject-level rescale map:
        # M_k = sum_s (d bg_s,k / d lt_k)^2 / tau_s^2 + (-prior'')
        cols = []
        for k in range(p):
            tangent = jnp.zeros_like(lt).at[:, k].set(1.0)
            _, J = jax.jvp(bg_s_of, (lt,), (tangent,))
            cols.append(jnp.sum(
                J[..., k] ** 2 * inv_ts2[:, None, k], axis=1
            ))
        M = jnp.stack(cols, axis=-1)                      # (C, p)
        # make_nested_poisson defaults: tau_ig_scale=0.25, HN scale 1.0
        if tau_prior == "invgamma":
            return M + 4.0 * 0.25 * jnp.exp(-2.0 * lt)
        return M + 2.0 * jnp.exp(2.0 * lt) / 1.0**2

    k1, k2 = jax.random.split(key)
    eps = jax.random.normal(k1, lt0.shape, lt0.dtype)
    logu = jnp.log(jax.random.uniform(
        k2, (C,), lt0.dtype, minval=jnp.finfo(lt0.dtype).tiny
    ))
    m_old = metric(lt0)
    mean_old = lt0 + gF(lt0) / m_old
    lt1 = mean_old + eps / jnp.sqrt(m_old)
    m_new = metric(lt1)
    mean_new = lt1 + gF(lt1) / m_new
    rev = lt0 - mean_new
    q_corr = jnp.sum(
        -0.5 * rev * rev * m_new + 0.5 * jnp.log(m_new)
        + 0.5 * eps * eps - 0.5 * jnp.log(m_old),
        axis=-1,
    )
    log_alpha_ref = F(lt1) - F(lt0) + q_corr
    alpha_ref = jnp.exp(jnp.minimum(log_alpha_ref, 0.0))
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), rtol=0, atol=2e-3
    )
    accept = np.asarray(logu) < np.asarray(log_alpha_ref)
    np.testing.assert_allclose(
        np.asarray(pos_up["log_tau_g"]),
        np.where(accept[:, None], np.asarray(lt1), np.asarray(lt0)),
        atol=5e-4,
    )


@pytest.mark.parametrize("tau_prior", ["halfnormal", "invgamma"])
def test_langevin_asis_tau_s_matches_autodiff_in_grad_mode(tau_prior):
    """asis_tau_s upgrades to Langevin when the MALA grad cache is live."""
    data, model, position = _setup(tau_prior)
    S = data.num_subjects
    self_vag, _ = model.cond_cached_grad["beta_s"]
    v, g = self_vag(position["beta_s"], data)
    cache = {"beta_s": {"v": v, "g": g}}
    key = jax.random.key(22)
    scale = jnp.full((C, 1), 0.05, jnp.float32)
    pos_up, cache_up, alpha = model.joint_moves["asis_tau_s"](
        key, position, cache, scale, data
    )

    bs, lt0 = position["beta_s"], position["log_tau_s"]
    bg_s = jnp.take(position["beta_g"], data.subject_group, axis=1)
    tau_z = bs - bg_s

    def F(lt):
        bs_p = bg_s + tau_z * jnp.exp(lt - lt0)[:, None, :]
        st = {**position, "beta_s": bs_p, "log_tau_s": lt}
        return model.joint_logdensity(st, data) + S * jnp.sum(lt, axis=-1)

    alpha_ref = _mala_ref(F, lt0, scale, key)
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), rtol=0, atol=2e-3
    )

    # refreshed cache must match the selected position
    v_sel, g_sel = self_vag(pos_up["beta_s"], data)
    np.testing.assert_allclose(
        np.asarray(cache_up["beta_s"]["v"]), np.asarray(v_sel),
        rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cache_up["beta_s"]["g"]), np.asarray(g_sel),
        rtol=0, atol=1e-4,
    )


@pytest.mark.parametrize("frozen", [False, True])
def test_laplace_asis_tau_s_matches_dense_reference_in_newton_mode(frozen):
    """With the Newton cache live ({'v','g','h'}) asis_tau_s is a
    parameter-free p-dim Gauss-Newton LAPLACE move. Reference: gradient
    from autodiff of the z-fixed joint; metric built independently from
    per-subject jax.hessian of the subject loglik + the known prior
    curvature; dense numpy cholesky/solves for the proposal map and the
    full q ratio (incl. log-determinants). frozen=True holds the carried
    Hessian constant on the reverse side (KernelConfig.newton_freeze)."""
    data, model, position = _setup("invgamma")
    S = data.num_subjects
    p = position["log_tau_s"].shape[-1]
    self_vgh, _ = model.cond_cached_newton["beta_s"]
    v, g, h = self_vgh(position["beta_s"], data)
    cache = {"beta_s": {"v": v, "g": g, "h": h}}
    key = jax.random.key(24)
    scale = jnp.full((C, 1), 0.05, jnp.float32)  # ignored (Laplace)
    pos_up, cache_up, alpha = model.joint_moves["asis_tau_s"](
        key, position, cache, scale, data, frozen=frozen
    )

    bs, lt0 = position["beta_s"], position["log_tau_s"]
    bg_s = jnp.take(position["beta_g"], data.subject_group, axis=1)
    tau_z = np.asarray(bs - bg_s, np.float64)            # (C, S, p)

    def F(lt):
        bs_p = bg_s + jnp.asarray(tau_z) * jnp.exp(
            lt - lt0
        )[:, None, :]
        st = {**position, "beta_s": bs_p, "log_tau_s": lt}
        return model.joint_logdensity(st, data) + S * jnp.sum(lt, axis=-1)

    gF = jax.grad(lambda vv: jnp.sum(F(vv)))

    def subj_hess(bs_at):
        """per-(chain, subject) dense -Hessian of the subject loglik via
        autodiff (independent of the model's packed implementation)."""
        def ll_one(bvec, s):
            eta = data.x[s] @ bvec
            from jax.scipy.special import gammaln as _gl

            return jnp.sum(
                (data.y[s] * eta - jnp.exp(eta) - _gl(data.y[s] + 1.0))
                * data.mask[s]
            )

        hs = np.zeros((C, S, p, p))
        for c in range(C):
            for s in range(S):
                hs[c, s] = -np.asarray(
                    jax.hessian(ll_one)(bs_at[c, s], s), np.float64
                )
        return hs

    # prior curvature: make_nested_poisson invgamma defaults a=2, b=0.25
    def prior_metric(lt):
        return 4.0 * 0.25 * np.exp(-2.0 * np.asarray(lt, np.float64))

    def metric(h_dense, d, lt):
        M = np.einsum("cskl,csk,csl->ckl", h_dense, d, d)
        for k in range(p):
            M[:, k, k] += prior_metric(lt)[:, k]
        return M

    k1, k2 = jax.random.split(key)
    eps = np.asarray(
        jax.random.normal(k1, lt0.shape, lt0.dtype), np.float64
    )
    lt0n = np.asarray(lt0, np.float64)
    h0 = subj_hess(np.asarray(bs, np.float64))
    M_old = metric(h0, tau_z, lt0)
    f_old = np.asarray(gF(lt0), np.float64)
    lt1 = np.zeros_like(lt0n)
    for c in range(C):
        L = np.linalg.cholesky(M_old[c])
        mean = lt0n[c] + np.linalg.solve(M_old[c], f_old[c])
        lt1[c] = mean + np.linalg.solve(L.T, eps[c])
    lt1_j = jnp.asarray(lt1, jnp.float32)
    ratio = np.exp(lt1 - lt0n)[:, None, :]
    d_new = tau_z * ratio
    bs_new = np.asarray(bg_s, np.float64) + d_new
    h1 = h0 if frozen else subj_hess(bs_new)
    M_new = metric(h1, d_new, lt1_j)
    f_new = np.asarray(gF(lt1_j), np.float64)
    la_ref = np.zeros(C)
    for c in range(C):
        mean_new = lt1[c] + np.linalg.solve(M_new[c], f_new[c])
        rev = lt0n[c] - mean_new
        _, ld_new = np.linalg.slogdet(M_new[c])
        _, ld_old = np.linalg.slogdet(M_old[c])
        q_corr = (
            -0.5 * rev @ M_new[c] @ rev + 0.5 * ld_new
            + 0.5 * eps[c] @ eps[c] - 0.5 * ld_old
        )
        la_ref[c] = float(F(lt1_j)[c] - F(lt0)[c]) + q_corr
    alpha_ref = np.exp(np.minimum(la_ref, 0.0))
    np.testing.assert_allclose(
        np.asarray(alpha), alpha_ref, rtol=0, atol=2e-3
    )
    # frozen: the carried Hessian passes through by reference
    if frozen:
        assert cache_up["beta_s"]["h"] is h


def test_rw_asis_tau_s_without_grad_cache():
    """Without a grad cache asis_tau_s stays a plain random walk."""
    data, model, position = _setup("halfnormal")
    S = data.num_subjects
    self_vag, _ = model.cond_cached_grad["beta_s"]
    v, _ = self_vag(position["beta_s"], data)
    key = jax.random.key(23)
    scale = jnp.full((C, 1), 0.05, jnp.float32)
    _, _, alpha = model.joint_moves["asis_tau_s"](
        key, position, {"beta_s": v}, scale, data
    )
    bs, lt0 = position["beta_s"], position["log_tau_s"]
    bg_s = jnp.take(position["beta_g"], data.subject_group, axis=1)
    tau_z = bs - bg_s
    k1, _ = jax.random.split(key)
    eps = jax.random.normal(k1, lt0.shape, lt0.dtype)
    lt_new = lt0 + scale * eps

    def F(lt):
        bs_p = bg_s + tau_z * jnp.exp(lt - lt0)[:, None, :]
        st = {**position, "beta_s": bs_p, "log_tau_s": lt}
        return model.joint_logdensity(st, data) + S * jnp.sum(lt, axis=-1)

    alpha_ref = jnp.exp(jnp.minimum(F(lt_new) - F(lt0), 0.0))
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), rtol=0, atol=2e-3
    )
