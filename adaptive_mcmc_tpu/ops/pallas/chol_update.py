"""Pallas TPU kernel: batched rank-1 Cholesky update, chains on lanes.

The XLA implementation (ops/cholesky.py) is a length-d ``lax.scan`` whose
per-step ops are (chains, d) arrays — with chains in the *sublane* position
and d (= 10..26) in the 128-wide lane position, >90% of each VPU op is
padding, and the scan carries cross-step dependencies XLA can't fuse away.
Measured on a v5e chip this makes the update ~91 us per 4096-chain
iteration — 92% of the whole ARWMH step.

This kernel flips the layout to (d, d, chains): the chain axis rides the
128-wide lanes, every op in the column recursion is a dense (d, Cb) tile,
and the d-step recursion is fully unrolled at trace time (d is static).

Algorithm (same LDL^T rank-one modification as ops/cholesky.py — Gill,
Golub, Murray & Saunders 1974, method C1):

    a <- coef ; w <- v
    for j in 0..d-1:
        unit_j = L[:, j] / L[j, j]     # unit-lower column
        D_j    = L[j, j]^2
        p      = w[j]
        D'_j   = D_j + a p^2
        beta   = p a / D'_j
        a      <- a D_j / D'_j
        w      <- w - p unit_j         # zeroes w[j]
        L'[:, j] = (unit_j + beta w) * sqrt(D'_j)

Used by ``ops.cholesky.rank1_cholesky_update_batched`` on TPU backends;
verified against dense re-factorization and the scan implementation in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128


def _kernel(d: int):
    def kernel(L_ref, v_ref, coef_ref, out_ref):
        a = coef_ref[0, :]                      # (Cb,)
        w = v_ref[:, :]                         # (d, Cb)
        row_ge = [
            jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0) >= j
            for j in range(d)
        ]
        for j in range(d):
            # Column recursion, reassociated so the wide (d, Cb) work is
            # exactly two FMA-shaped ops per column; everything else is
            # cheap lane-wide (Cb,) arithmetic:
            #   w'      = w - (p / diag) * col
            #   L'[:,j] = (sqrt(D')/diag) * col + (beta*sqrt(D')) * w'
            col = L_ref[:, j, :]                # (d, Cb)
            diag = L_ref[j, j, :]               # (Cb,)
            inv_diag = 1.0 / diag
            Dj = diag * diag
            p = w[j, :]
            Dj_new = Dj + a * p * p
            inv_Dj_new = 1.0 / Dj_new
            sqrt_Dj_new = jnp.sqrt(Dj_new)
            s_w = p * inv_diag
            s_col = sqrt_Dj_new * inv_diag
            s_new = (p * a) * inv_Dj_new * sqrt_Dj_new
            a = a * Dj * inv_Dj_new
            w = w - s_w[None, :] * col
            col_new = s_col[None, :] * col + s_new[None, :] * w
            # strict lower-triangularity: kill fp dust above the diagonal
            out_ref[:, j, :] = jnp.where(row_ge[j], col_new, 0.0)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def chol_update_pallas_cl(
    Lt: Array, vt: Array, coef: Array, *, interpret: bool | None = None
) -> Array:
    """Chains-LAST entry point: ``Lt`` (d, d, C), ``vt`` (d, C), ``coef``
    (C,) — the kernel's native layout, zero transposes.  Used by drivers
    whose internal layout already rides chains on the lane axis
    (kernels/asss.py pipelined driver)."""
    d, _, C = Lt.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cb = _LANE
    while cb * 2 <= min(C, 1024):
        cb *= 2
    pad = (-C) % cb
    if pad:
        # padded chains run the recursion on identity factors (harmless)
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=Lt.dtype)[:, :, None], (d, d, pad)
        )
        Lt = jnp.concatenate([Lt, eye], axis=2)
        vt = jnp.concatenate([vt, jnp.zeros((d, pad), vt.dtype)], axis=1)
        coef = jnp.concatenate([coef, jnp.ones((pad,), coef.dtype)], axis=0)
    Cp = C + pad

    out = pl.pallas_call(
        _kernel(d),
        grid=(Cp // cb,),
        in_specs=[
            pl.BlockSpec((d, d, cb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, d, cb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, d, Cp), Lt.dtype),
        interpret=interpret,
    )(Lt, vt, coef[None, :])

    return out[..., :C] if pad else out


@partial(jax.jit, static_argnames=("interpret",))
def chol_update_pallas(
    L: Array, v: Array, coef: Array, *, interpret: bool | None = None
) -> Array:
    """chol(L_i L_i^T + coef_i v_i v_i^T) for a (C, d, d) batch.

    Layout contract: inputs arrive chains-first (framework convention);
    the wrapper transposes to chains-last for the kernel and back.  The
    two transposes move ~2 d^2 C floats — negligible next to the scan
    implementation's serialized latency.
    """
    out = chol_update_pallas_cl(
        jnp.transpose(L, (1, 2, 0)), v.T, coef, interpret=interpret
    )
    return jnp.transpose(out, (2, 0, 1))
