"""Bucketed evaluation of ragged likelihoods through the PADDED kernels.

The alternative ragged strategy to the tiled-CSR segment kernel
(ops/pallas/loglik_segment.py): partition groups into size buckets, pad
each bucket only to its own cap (power-of-2 edges bound padding waste to
<2x), and run the measured-optimal padded kernel once per bucket —
SURVEY.md §2.1 "size-bucketing to bound padding waste", the engine wiring
for data.py::bucket_by_size.

Like TiledSegmentLayout, the bucket structure is built ONCE on the host
from the (static) segment structure; the value gathers run traced, are
loop-invariant in the sampling scan, and keep data sharding flowing
through the jit boundary.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Bucket:
    group_index: jnp.ndarray   # (Gb,) int32 original group ids
    obs_index: jnp.ndarray     # (Gb, cap) int32 flat obs ids, -1 = pad
    cap: int


@dataclass(frozen=True)
class BucketLayout:
    buckets: tuple            # tuple[Bucket, ...]
    num_groups: int

    @staticmethod
    def build(segment_ids, num_groups: int, edges=None,
              min_groups: int = 32) -> "BucketLayout":
        """Bucket groups by size with power-of-2 edges (or explicit
        ``edges``); buckets smaller than ``min_groups`` merge upward so a
        long size tail cannot fragment into many tiny kernel launches.
        Size-0 groups fall in no bucket (their log-likelihood is zero)."""
        seg = np.asarray(segment_ids)
        if seg.size and np.any(np.diff(seg) < 0):
            raise ValueError("segment_ids must be sorted ascending")
        sizes = np.bincount(seg, minlength=num_groups)
        start = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        cap_max = int(sizes.max()) if num_groups else 0
        if edges is None:
            edges, e = [], 1
            while e < cap_max:
                e *= 2
                edges.append(e)
            if not edges:
                edges = [max(cap_max, 1)]
        buckets, pending = [], []
        lo = 0
        for hi in edges:
            idx = np.where((sizes > lo) & (sizes <= hi))[0]
            lo = hi
            pending.append((hi, idx))
            total = sum(len(i) for _, i in pending)
            if total == 0:
                continue
            is_last = hi == edges[-1]
            if total < min_groups and not is_last:
                continue  # merge into the next bucket up
            cap = pending[-1][0]
            gidx = np.concatenate([i for _, i in pending])
            gidx.sort()
            pending = []
            col = np.arange(cap, dtype=np.int64)[None, :]
            row = start[gidx][:, None] + col
            valid = col < sizes[gidx][:, None]
            obs = np.where(valid, row, -1).astype(np.int32)
            buckets.append(Bucket(
                group_index=jnp.asarray(gidx.astype(np.int32)),
                obs_index=jnp.asarray(obs),
                cap=cap,
            ))
        return BucketLayout(buckets=tuple(buckets), num_groups=num_groups)

    def padded_obs(self) -> int:
        return int(sum(
            b.obs_index.shape[0] * b.cap for b in self.buckets
        ))


def _gather_bucket(b: Bucket, x, y):
    """Traced: flat (N, p)/(N,) -> padded (Gb, cap, p)/(Gb, cap) + mask."""
    valid = b.obs_index >= 0
    safe = jnp.maximum(b.obs_index, 0)
    xb = jnp.where(
        valid[:, :, None], jnp.take(x, safe.reshape(-1), axis=0)
        .reshape(safe.shape + (x.shape[-1],)), 0.0,
    )
    yb = jnp.where(valid, jnp.take(y, safe.reshape(-1), axis=0)
                   .reshape(safe.shape), 0.0)
    return xb, yb, valid.astype(jnp.float32)


def bucketed_logistic_loglik(beta, x, y, layout: BucketLayout,
                             impl: str = "jnp"):
    """(C, G, p) beta + flat ragged obs -> (C, G) loglik, one padded-kernel
    launch per bucket. Parity contract with
    ops/loglik.py::logistic_loglik_segment (tests/test_bucket.py)."""
    from nestmc.ops.loglik import logistic_loglik_padded

    C, G, _ = beta.shape
    ll = jnp.zeros((C, G), jnp.float32)
    for b in layout.buckets:
        xb, yb, mb = _gather_bucket(b, x, y)
        bb = jnp.take(beta, b.group_index, axis=1)
        if impl == "pallas":
            from nestmc.ops.pallas.loglik_logistic import (
                logistic_loglik_padded_pallas,
            )

            llb = logistic_loglik_padded_pallas(bb, xb, yb, mb)
        else:
            llb = logistic_loglik_padded(bb, xb, yb, mb)
        ll = ll.at[:, b.group_index].set(llb)
    return ll


def bucketed_logistic_logp_grad_hess(beta, x, y, layout: BucketLayout,
                                     impl: str = "jnp"):
    """Fused value+grad+packed-Hessian per bucket — the Newton-MH obs
    pass on ragged data: ((C, G), (C, G, p), (C, G, T)). Same parity
    contract as ops/loglik.py::logistic_logp_grad_hess_segment."""
    C, G, p = beta.shape
    T = p * (p + 1) // 2
    ll = jnp.zeros((C, G), jnp.float32)
    grad = jnp.zeros((C, G, p), jnp.float32)
    hess = jnp.zeros((C, G, T), jnp.float32)
    for b in layout.buckets:
        xb, yb, mb = _gather_bucket(b, x, y)
        bb = jnp.take(beta, b.group_index, axis=1)
        if impl == "pallas":
            from nestmc.ops.pallas.loglik_logistic import (
                logistic_logp_grad_hess_pallas,
            )

            llb, gb, hb = logistic_logp_grad_hess_pallas(bb, xb, yb, mb)
        else:
            from nestmc.ops.loglik import logistic_logp_grad_hess_padded

            llb, gb, hb = logistic_logp_grad_hess_padded(bb, xb, yb, mb)
        ll = ll.at[:, b.group_index].set(llb)
        grad = grad.at[:, b.group_index, :].set(gb)
        hess = hess.at[:, b.group_index, :].set(hb)
    return ll, grad, hess


def covers_all_groups(layout: BucketLayout) -> bool:
    """True when every group falls in some bucket (i.e. no size-0 groups).

    The bucketed FUSED STEPS below update only bucketed groups; a size-0
    group still needs its prior-only MH move each sweep, so the model
    wiring must fall back to the unfused update when coverage is partial
    (the bucketed LIKELIHOOD reductions above are unaffected: a size-0
    group's log-likelihood is exactly the zero the scatter leaves)."""
    covered = sum(int(b.group_index.shape[0]) for b in layout.buckets)
    return covered == layout.num_groups


def bucketed_fused_mala_step(key, beta, v, g, log_scale, mu, log_tau,
                             x, y, layout: BucketLayout, noise=None):
    """Single-kernel MALA step (ops/pallas/mala_accept.py) over ragged
    data: one fused propose+logp+grad+correct+accept launch per size
    bucket, gather/scatter glue between. Each bucket is an independent
    partition of the conditionally-independent group block, so running
    the padded fused kernel per bucket IS the whole-block update — same
    math as kernels/mala.py, per-bucket PRNG streams via fold_in.

    beta (C,G,p); v (C,G)/g (C,G,p) the carried data-lik cache; noise:
    None (on-core PRNG) or (eps (C,G,p), logu (C,G)) for exact-parity
    tests. Requires covers_all_groups(layout) — callers enforce.
    Returns (new_beta, new_v, new_g, alpha (C,G))."""
    from nestmc.ops.pallas.mala_accept import fused_mala_logistic_step

    C, G, _ = beta.shape
    nb, nv, ng = beta, v, g
    alpha = jnp.zeros((C, G), jnp.float32)
    per_unit_scale = log_scale.shape[-1] != 1
    for i, b in enumerate(layout.buckets):
        xb, yb, mb = _gather_bucket(b, x, y)
        kb = jax.random.fold_in(key, i)
        bb = jnp.take(beta, b.group_index, axis=1)
        vb = jnp.take(v, b.group_index, axis=1)
        gb = jnp.take(g, b.group_index, axis=1)
        lsb = (
            jnp.take(log_scale, b.group_index, axis=1)
            if per_unit_scale else log_scale
        )
        nz = None
        if noise is not None:
            eps, logu = noise
            nz = (
                jnp.take(eps, b.group_index, axis=1),
                jnp.take(logu, b.group_index, axis=1),
            )
        nbb, nvb, ngb, ab = fused_mala_logistic_step(
            kb, bb, vb, gb, lsb, mu, log_tau, xb, yb, mb, noise=nz,
        )
        nb = nb.at[:, b.group_index].set(nbb)
        nv = nv.at[:, b.group_index].set(nvb)
        ng = ng.at[:, b.group_index].set(ngb)
        alpha = alpha.at[:, b.group_index].set(ab)
    return nb, nv, ng, alpha


def bucketed_fused_newton_step(key, beta, v, g, h, log_scale, mu, log_tau,
                               x, y, layout: BucketLayout, noise=None,
                               frozen: bool = False):
    """Newton-MH analog of bucketed_fused_mala_step
    (ops/pallas/newton_accept.py per bucket): Laplace propose +
    logp/grad(+Hess) obs pass + correction + accept in one kernel per
    size bucket. frozen: the carried packed Hessian is a constant metric
    (sampling phase of KernelConfig.newton_freeze) — per-bucket kernels
    skip the Hessian pass and h is returned unchanged.
    Returns (new_beta, new_v, new_g, new_h, alpha (C,G))."""
    from nestmc.ops.pallas.newton_accept import fused_newton_logistic_step

    C, G, _ = beta.shape
    nb, nv, ng, nh = beta, v, g, h
    alpha = jnp.zeros((C, G), jnp.float32)
    per_unit_scale = log_scale.shape[-1] != 1
    for i, b in enumerate(layout.buckets):
        xb, yb, mb = _gather_bucket(b, x, y)
        kb = jax.random.fold_in(key, i)
        bb = jnp.take(beta, b.group_index, axis=1)
        vb = jnp.take(v, b.group_index, axis=1)
        gb = jnp.take(g, b.group_index, axis=1)
        hb = jnp.take(h, b.group_index, axis=1)
        lsb = (
            jnp.take(log_scale, b.group_index, axis=1)
            if per_unit_scale else log_scale
        )
        nz = None
        if noise is not None:
            eps, logu = noise
            nz = (
                jnp.take(eps, b.group_index, axis=1),
                jnp.take(logu, b.group_index, axis=1),
            )
        nbb, nvb, ngb, nhb, ab = fused_newton_logistic_step(
            kb, bb, vb, gb, hb, lsb, mu, log_tau, xb, yb, mb,
            noise=nz, frozen=frozen,
        )
        nb = nb.at[:, b.group_index].set(nbb)
        nv = nv.at[:, b.group_index].set(nvb)
        ng = ng.at[:, b.group_index].set(ngb)
        if not frozen:
            nh = nh.at[:, b.group_index].set(nhb)
        alpha = alpha.at[:, b.group_index].set(ab)
    return nb, nv, ng, nh, alpha


def bucketed_logistic_logp_grad(beta, x, y, layout: BucketLayout,
                                impl: str = "jnp"):
    """Fused value+grad per bucket: ((C, G), (C, G, p))."""
    C, G, p = beta.shape
    ll = jnp.zeros((C, G), jnp.float32)
    grad = jnp.zeros((C, G, p), jnp.float32)
    for b in layout.buckets:
        xb, yb, mb = _gather_bucket(b, x, y)
        bb = jnp.take(beta, b.group_index, axis=1)
        if impl == "pallas":
            from nestmc.ops.pallas.loglik_logistic import (
                logistic_logp_grad_pallas,
            )

            llb, gb = logistic_logp_grad_pallas(bb, xb, yb, mb)
        else:
            from nestmc.ops.loglik import logistic_loglik_padded

            llb, vjp = jax.vjp(
                lambda bb_: logistic_loglik_padded(bb_, xb, yb, mb), bb
            )
            (gb,) = vjp(jnp.ones_like(llb))
        ll = ll.at[:, b.group_index].set(llb)
        grad = grad.at[:, b.group_index, :].set(gb)
    return ll, grad
