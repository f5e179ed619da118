"""Rank-1 Cholesky update — the sequential O(d^2) core of covariance
adaptation.

Computes ``chol(L @ L.T + coef * v @ v.T)`` from the existing factor ``L``
without re-factorizing, using the LDL^T form of the classic rank-one
modification algorithm (Gill, Golub, Murray & Saunders 1974, method C1).
This replaces NumPyro's ``cholesky_update`` used by the reference's
adaptation recursions (arwmh.py:190, asss.py:254) — semantics are verified
against dense re-factorization in tests.

Derivation (unit-triangular form): write L = L̃ sqrt(D) with L̃ unit lower
triangular, D = diag(L)^2, so A = L̃ D L̃ᵀ.  For A' = A + σ v vᵀ:

    a ← σ ; w ← v
    for j = 1..d:
        p       = w[j]
        D'[j]   = D[j] + a p²
        β       = p a / D'[j]
        a       ← a D[j] / D'[j]
        w       ← w - p L̃[:, j]          # zeroes w[j]; w[<j] already 0
        L̃'[:, j] = L̃[:, j] + β w

Each loop step is a length-d vector op, so under ``vmap`` over chains the
scan body is a dense (chains, d) VPU op — the sequential dependency is over
the *small* d axis while the wide chains axis stays vectorized.  A Pallas
TPU kernel with chains on lanes lives in ``ops/pallas/chol_update.py`` and
is dispatched via ``rank1_cholesky_update_batched``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def rank1_cholesky_update(L: Array, v: Array, coef: Array | float = 1.0) -> Array:
    """Return ``chol(L @ L.T + coef * outer(v, v))`` (lower triangular).

    ``L``: (d, d) lower triangular with positive diagonal; ``v``: (d,);
    ``coef``: scalar (may be negative for a downdate — an indefinite result
    produces NaNs, which callers guard on, mirroring the reference's
    NaN-fallback at arwmh.py:191).
    """
    d = L.shape[-1]
    diag = jnp.diagonal(L)
    unit_L = L / diag[None, :]          # divide each column by its pivot
    D = diag * diag

    def body(carry, inp):
        a, w = carry
        j, Lj, Dj = inp
        p = w[j]
        Dj_new = Dj + a * p * p
        beta = p * a / Dj_new
        a_new = a * Dj / Dj_new
        w_new = w - p * Lj
        Lj_new = Lj + beta * w_new
        return (a_new, w_new), (Dj_new, Lj_new)

    cols = jnp.swapaxes(unit_L, -1, -2)  # (d, d): cols[j] = unit_L[:, j]
    (_, _), (D_new, cols_new) = lax.scan(
        body,
        (jnp.asarray(coef, L.dtype), v.astype(L.dtype)),
        (jnp.arange(d), cols, D),
    )
    # tril: the scan leaves O(eps) dust above the diagonal (w is only
    # approximately zeroed); factors must be exactly triangular.
    return jnp.tril(jnp.swapaxes(cols_new, -1, -2) * jnp.sqrt(D_new)[None, :])


def rank1_cholesky_update_batched(
    L: Array, v: Array, coef: Array, *, use_pallas: bool | None = None
) -> Array:
    """Batched ``chol(L_i L_iᵀ + coef_i v_i v_iᵀ)`` over a leading chains axis.

    ``L``: (C, d, d); ``v``: (C, d); ``coef``: scalar or (C,).
    Dispatches to the Pallas TPU kernel when available (chains on lanes),
    else to the vmapped scan implementation.
    """
    coef = jnp.broadcast_to(jnp.asarray(coef, L.dtype), L.shape[:1])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            from adaptive_mcmc_tpu.ops.pallas.chol_update import (
                chol_update_pallas,
            )

            return chol_update_pallas(L, v, coef)
        except Exception:  # pragma: no cover - pallas unavailable fallback
            pass
    return jax.vmap(rank1_cholesky_update)(L, v, coef)


def adaptive_scale_update(
    L: Array, delta: Array, gamma: Array, eps_nan_guard: bool = True
) -> Array:
    """One covariance-adaptation step of the reference recursions:

        L' = chol((1 - γ) L Lᵀ + γ δ δᵀ)   via  rank1(√(1-γ)·L, δ, γ)

    with the reference's NaN guard (keep the old factor if the update
    produced any NaN — arwmh.py:190-191, asss.py:254-255).
    Works for unbatched (d,d)/(d,) and batched (C,d,d)/(C,d) inputs.
    """
    gamma = jnp.asarray(gamma, L.dtype)
    scaled = jnp.sqrt(1.0 - gamma) * L if L.ndim == 2 else (
        jnp.sqrt(1.0 - gamma)[:, None, None] * L
    )
    if L.ndim == 2:
        new = rank1_cholesky_update(scaled, delta, gamma)
        if not eps_nan_guard:
            return new
        return jnp.where(jnp.any(jnp.isnan(new)), L, new)
    new = rank1_cholesky_update_batched(scaled, delta, gamma)
    if not eps_nan_guard:
        return new
    bad = jnp.any(jnp.isnan(new), axis=(-2, -1))
    return jnp.where(bad[:, None, None], L, new)


def _rank1_update_cl(L: Array, v: Array, a0: Array) -> Array:
    """Chains-LAST unrolled GGMS74-C1 column recursion (same math as the
    Pallas kernel, issued as plain XLA ops so it fuses into the caller's
    loop body): ``L`` (d, d, C) lower, ``v`` (d, C), ``a0`` (C,)."""
    d = L.shape[0]
    a, w = a0, v
    cols = []
    for j in range(d):
        col = L[:, j, :]                     # (d, C)
        diag = L[j, j, :]                    # (C,)
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
        mask = (jnp.arange(d) >= j)[:, None]
        cols.append(jnp.where(mask, col_new, 0.0))
    return jnp.stack(cols, axis=1)           # (d, d, C)


def adaptive_scale_update_cl(
    L: Array, delta: Array, gamma: Array, eps_nan_guard: bool = True,
    use_pallas: bool | None = None,
) -> Array:
    """Chains-last twin of :func:`adaptive_scale_update`: ``L`` (d, d, C),
    ``delta`` (d, C), ``gamma`` (C,).  Dispatches to the Pallas kernel's
    native-layout entry (zero transposes) on TPU."""
    gamma = jnp.asarray(gamma, L.dtype)
    scaled = jnp.sqrt(1.0 - gamma)[None, None, :] * L
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    new = None
    if use_pallas:
        try:
            from adaptive_mcmc_tpu.ops.pallas.chol_update import (
                chol_update_pallas_cl,
            )

            new = chol_update_pallas_cl(scaled, delta, gamma)
        except Exception:  # pragma: no cover - pallas unavailable fallback
            pass
    if new is None:
        new = _rank1_update_cl(scaled, delta, gamma)
    if not eps_nan_guard:
        return new
    bad = jnp.any(jnp.isnan(new), axis=(0, 1))
    return jnp.where(bad[None, None, :], L, new)
