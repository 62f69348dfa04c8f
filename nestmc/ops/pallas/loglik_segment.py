"""Fused SEGMENT (ragged) Bernoulli-logit log-likelihood (+grad) Pallas
TPU kernels — BASELINE.json:10's 10k-ragged-group config at MALA scale.

Problem shape: beta (C, G, p), flat ragged obs x (N, p), y (N,) with sorted
``segment_ids`` mapping obs -> group. The jnp reference
(ops/loglik.py::logistic_loglik_segment / logistic_logp_grad_segment)
materializes (C, N) intermediates in HBM (~700 MB at C=1024, N=175k); this
kernel streams obs chunks through VMEM and writes only the (C, G) + (C, G, p)
results.

Design — tiled CSR over a (chain-tile, obs-chunk) grid:

* Groups are partitioned into consecutive tiles of TG. Each tile's obs
  (contiguous, since segment_ids is sorted) are padded to a multiple of the
  chunk size TN and concatenated; every tile owns >= 1 chunk (empty tiles
  get an all-padding chunk so their output block is still zeroed). This
  re-layout depends only on the segment structure, so it is built ONCE on
  the host (numpy) at model construction; the obs gather itself runs traced
  (x/y flow through the jit boundary) and is loop-invariant in the scan.
* Grid = (C/TC, num_chunks), chunks innermost. Output block indices come
  from a scalar-prefetch chunk->tile map, so all chunks of one tile revisit
  the SAME output block on consecutive grid steps — Pallas keeps it
  resident in VMEM and the kernel accumulates, zeroing on each tile's
  first chunk (pltpu.PrefetchScalarGridSpec; the block-sparse-matmul
  pattern).
* Per-obs coefficients are gathered with a one-hot MXU matmul:
  onehot (TN, TG) built in-registers from the local group ids, then
  eta += x[:, k] * (onehot @ beta[:, k, :]) per coordinate. Padding rows
  have an all-zero one-hot row, so they vanish in both the gather and the
  obs->group reductions (onehot^T @ ll_obs) without any masking.

The one-hot contraction costs TG x the gather's FLOPs, so TG trades MXU
work against grid length and tile padding. Measured (v5e, C=1024, G=10k,
N=174k, p=3, fused logp+grad, f32-precision dots): TG=32/TN=256 12.34 ms,
TG=64 12.88 ms, TN=512 14.30 ms, TG=16 13.87 ms — all SLOWER than the
size-bucketed padded path (ops/bucket.py, 6.43 ms), which hier_logistic's
'auto' therefore prefers; this kernel remains the choice when bucketing is
unusable (e.g. group sizes too skewed for <2x padding, or layouts that
must not duplicate obs arrays).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax import nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(total: int, candidates) -> int:
    for t in candidates:
        if total % t == 0:
            return t
    return total


@dataclass(frozen=True)
class TiledSegmentLayout:
    """Static obs re-layout for one ragged dataset (host-built, reused
    across every sweep; depends only on segment_ids, never on values)."""

    obs_index: jnp.ndarray     # (Np,) int32 source obs index, -1 = padding
    local_group: jnp.ndarray   # (Np,) int32 group id within tile, -1 = pad
    chunk_tile: jnp.ndarray    # (J,) int32 tile of each chunk
    chunk_first: jnp.ndarray   # (J,) int32 1 = first chunk of its tile
    tile_groups: int           # TG
    chunk_obs: int             # TN
    num_tiles: int
    num_chunks: int
    num_groups: int            # true G
    padded_groups: int         # num_tiles * TG

    @staticmethod
    def build(segment_ids, num_groups: int, tile_groups: int = 32,
              chunk_obs: int = 256) -> "TiledSegmentLayout":
        seg = np.asarray(segment_ids)
        if seg.size and np.any(np.diff(seg) < 0):
            raise ValueError("segment_ids must be sorted ascending")
        TG, TN = tile_groups, chunk_obs
        tiles = max(1, -(-num_groups // TG))
        # obs range of each tile: [starts[t], starts[t+1])
        bounds = np.searchsorted(seg, np.arange(tiles + 1) * TG)
        obs_index, local_group = [], []
        chunk_tile, chunk_first = [], []
        for t in range(tiles):
            lo, hi = int(bounds[t]), int(bounds[t + 1])
            n = hi - lo
            nchunks = max(1, -(-n // TN))
            pad = nchunks * TN - n
            obs_index.append(np.arange(lo, hi, dtype=np.int32))
            obs_index.append(np.full(pad, -1, np.int32))
            local_group.append((seg[lo:hi] - t * TG).astype(np.int32))
            local_group.append(np.full(pad, -1, np.int32))
            chunk_tile.extend([t] * nchunks)
            chunk_first.extend([1] + [0] * (nchunks - 1))
        return TiledSegmentLayout(
            obs_index=jnp.asarray(np.concatenate(obs_index)),
            local_group=jnp.asarray(np.concatenate(local_group)),
            chunk_tile=jnp.asarray(np.array(chunk_tile, np.int32)),
            chunk_first=jnp.asarray(np.array(chunk_first, np.int32)),
            tile_groups=TG,
            chunk_obs=TN,
            num_tiles=tiles,
            num_chunks=len(chunk_tile),
            num_groups=num_groups,
            padded_groups=tiles * TG,
        )


def _gather_tiled(layout: TiledSegmentLayout, x, y):
    """Traced re-layout: (N, p) x, (N,) y -> (Np, p) xt, (Np, 2) y|lg.

    Loop-invariant in the sampling scan (XLA hoists it); padding rows get
    x = 0, y = 0, local_group = -1.
    """
    idx = layout.obs_index
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    xt = jnp.where(valid[:, None], jnp.take(x, safe, axis=0), 0.0)
    yt = jnp.where(valid, jnp.take(y, safe, axis=0), 0.0)
    ylg = jnp.stack(
        [yt, layout.local_group.astype(yt.dtype)], axis=-1
    )  # (Np, 2)
    return xt, ylg


def _beta_tiled(beta, layout: TiledSegmentLayout):
    """(C, G, p) -> (Gp, p, C) chains-minor, group axis padded to tiles."""
    bt = jnp.transpose(beta, (1, 2, 0))
    pad = layout.padded_groups - layout.num_groups
    if pad:
        bt = jnp.pad(bt, ((0, pad), (0, 0), (0, 0)))
    return bt


def _onehot(ylg_block, TG):
    """(TN, 2) y|local-group block -> (TN, TG) one-hot; pad rows all-zero."""
    lg = ylg_block[:, 1:2]                                     # (TN, 1)
    gids = jax.lax.broadcasted_iota(jnp.int32, lg.shape[:1] + (TG,), 1)
    return (lg == gids.astype(lg.dtype)).astype(jnp.float32)


def _reduce(onehot, obs_vals):
    """(TN, TG)^T @ (TN, TC) obs->group reduction on the MXU.

    Precision HIGHEST: the MXU ingests bf16 by default, and 0.4%-relative
    noise on a log-likelihood subtly perturbs the stationary distribution
    (measured max rel err 2.9e-3 vs the f32 reference on a real chip).
    """
    return jax.lax.dot_general(
        onehot, obs_vals, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _make_segment_kernel(p: int, TG: int, with_grad: bool):
    def kernel(ct_ref, cf_ref, xt_ref, ylg_ref, beta_ref, ll_ref,
               *maybe_gref):
        j = pl.program_id(1)
        onehot = _onehot(ylg_ref[:], TG)                     # (TN, TG)
        eta = None
        for k in range(p):
            bobs = jnp.dot(
                onehot, beta_ref[:, k, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                # (TN, TC)
            term = xt_ref[:, k:k + 1] * bobs
            eta = term if eta is None else eta + term
        y = ylg_ref[:, 0:1]                                  # (TN, 1)
        ll_obs = y * eta - nn.softplus(eta)                  # (TN, TC)
        llg = _reduce(onehot, ll_obs)                        # (TG, TC)
        first = cf_ref[j] == 1
        if with_grad:
            gref = maybe_gref[0]
            resid = y - nn.sigmoid(eta)                      # (TN, TC)
            gks = [
                _reduce(onehot, xt_ref[:, k:k + 1] * resid)
                for k in range(p)
            ]

            @pl.when(first)
            def _():
                ll_ref[:] = llg
                for k in range(p):
                    gref[:, k, :] = gks[k]

            @pl.when(jnp.logical_not(first))
            def _():
                ll_ref[:] = ll_ref[:] + llg
                for k in range(p):
                    gref[:, k, :] = gref[:, k, :] + gks[k]
        else:
            @pl.when(first)
            def _():
                ll_ref[:] = llg

            @pl.when(jnp.logical_not(first))
            def _():
                ll_ref[:] = ll_ref[:] + llg

    return kernel


def _segment_call(beta, x, y, layout: TiledSegmentLayout, with_grad: bool,
                  interpret: bool | None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    assert G == layout.num_groups, (G, layout.num_groups)
    TG, TN = layout.tile_groups, layout.chunk_obs
    J, Gp = layout.num_chunks, layout.padded_groups
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))

    xt, ylg = _gather_tiled(layout, x, y)
    bt = _beta_tiled(beta, layout)

    out_shape = [jax.ShapeDtypeStruct((Gp, C), jnp.float32)]
    out_specs = [pl.BlockSpec((TG, TC), lambda c, j, ct, cf: (ct[j], c))]
    if with_grad:
        out_shape.append(jax.ShapeDtypeStruct((Gp, p, C), jnp.float32))
        out_specs.append(
            pl.BlockSpec((TG, p, TC), lambda c, j, ct, cf: (ct[j], 0, c))
        )

    N_eff = int(x.shape[0])
    flops_gather = 2 * C * layout.num_chunks * TN * TG * p
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C // TC, J),
        in_specs=[
            pl.BlockSpec((TN, p), lambda c, j, ct, cf: (j, 0)),
            pl.BlockSpec((TN, 2), lambda c, j, ct, cf: (j, 0)),
            pl.BlockSpec((TG, p, TC), lambda c, j, ct, cf: (ct[j], 0, c)),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        _make_segment_kernel(p, TG, with_grad),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_gather * (2 if with_grad else 1)
            + 2 * C * layout.num_chunks * TN * TG,
            bytes_accessed=4 * (
                (C // TC) * layout.num_chunks * TN * (p + 2)
                + C * Gp * p + C * Gp * (1 + (p if with_grad else 0))
            ),
            transcendentals=(2 if with_grad else 1) * C * N_eff,
        ),
    )(layout.chunk_tile, layout.chunk_first, xt, ylg, bt)
    if with_grad:
        ll, g = out
        return ll[:G].T, jnp.transpose(g[:G], (2, 0, 1))
    return out[0][:G].T


def logistic_loglik_segment_pallas(beta, x, y, layout, interpret=None):
    """Ragged (C,G,p) -> (C,G) loglik; parity contract with
    ops/loglik.py::logistic_loglik_segment (tests/test_pallas_segment.py)."""
    return _segment_call(beta, x, y, layout, False, interpret)


def logistic_logp_grad_segment_pallas(beta, x, y, layout, interpret=None):
    """Fused value+grad for ragged MALA: ((C,G), (C,G,p)) with O(TN * TC)
    VMEM working set and no (C, N) HBM intermediates."""
    return _segment_call(beta, x, y, layout, True, interpret)
