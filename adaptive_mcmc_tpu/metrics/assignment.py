"""Linear sum assignment solvers for the exact 1-1 Wasserstein coupling.

Three backends behind one dispatch (cheapest-correct first):

* ``native`` — in-repo C++ Hungarian solver (``_native/lsap.cpp``), built on
  first use with ``make`` and loaded through ctypes.  Exact, host-side, and
  the fastest exact option at the n=10k scale the eval scripts use.
* ``scipy`` — ``scipy.optimize.linear_sum_assignment`` fallback (exact).
* ``auction`` — a JAX Bertsekas auction with ε-scaling that runs ON DEVICE:
  every round is a dense top-2-per-row reduction over the cost matrix, so
  it vectorizes over the VPU and never ships the O(n²) cost matrix to the
  host.  ε-approximate (within n·ε_final of optimal) — used when the cost
  matrix already lives in TPU HBM and an approximation suffices.
"""

from __future__ import annotations

import ctypes
import subprocess
from functools import partial
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "_native"
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _NATIVE_DIR / "liblsap.so"
    try:
        if not so.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(so))
        lib.lsap_solve_f64.restype = ctypes.c_int
        lib.lsap_solve_f64.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def linear_sum_assignment(
    cost: np.ndarray, solver: str = "auto"
) -> np.ndarray:
    """Exact minimum-cost row->col assignment.  ``cost``: (nr, nc), nr<=nc.
    Returns ``col`` indices per row."""
    cost = np.ascontiguousarray(np.asarray(cost, dtype=np.float64))
    nr, nc = cost.shape
    if solver in ("auto", "native"):
        lib = _load_native()
        if lib is not None:
            out = np.empty(nr, dtype=np.int64)
            rc = lib.lsap_solve_f64(
                nr,
                nc,
                cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            if rc == 0:
                return out
        if solver == "native":
            raise RuntimeError("native LSAP solver unavailable")
    from scipy.optimize import linear_sum_assignment as _scipy_lsap

    _, col = _scipy_lsap(cost)
    return col.astype(np.int64)


# ---------------------------------------------------------------------------
# On-device ε-auction (Bertsekas 1988) with ε-scaling.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_rounds",))
def _auction_one_eps(benefit, prices, eps, max_rounds):
    """Run the Jacobi auction to completion at one ε.  Each round:
    every unassigned row bids (top-2 reduction over its value row), each
    column keeps the best bid, displaced rows re-enter the pool.  All
    scatter steps are segment reductions — no dense (n, m) temporaries."""
    n, m = benefit.shape
    rows = jnp.arange(n, dtype=jnp.int32)
    cols = jnp.arange(m, dtype=jnp.int32)

    def cond(val):
        _, _, row_to_col, it = val
        return jnp.any(row_to_col < 0) & (it < max_rounds)

    def body(val):
        prices, col_owner, row_to_col, it = val
        unassigned = row_to_col < 0                      # (n,)
        values = benefit - prices[None, :]               # (n, m)
        top2_vals, top2_idx = lax.top_k(values, 2)
        best_j = top2_idx[:, 0].astype(jnp.int32)        # (n,)
        bid = prices[best_j] + (top2_vals[:, 0] - top2_vals[:, 1]) + eps
        bid = jnp.where(unassigned, bid, -jnp.inf)
        # best bid per column via scatter-max
        win_bid = jnp.full((m,), -jnp.inf).at[best_j].max(bid)
        got_bid = jnp.isfinite(win_bid)
        # deterministic winner among tied top bidders: lowest row index
        is_win = unassigned & (bid >= win_bid[best_j]) & jnp.isfinite(bid)
        win_row = (
            jnp.full((m,), n, jnp.int32)
            .at[jnp.where(is_win, best_j, m)]
            .min(rows, mode="drop")
        )
        # displace previous owners of re-auctioned columns
        prev_owner = jnp.where(got_bid, col_owner, -1)
        row_to_col = row_to_col.at[
            jnp.where(prev_owner >= 0, prev_owner, n)
        ].set(-1, mode="drop")
        # install winners
        col_owner = jnp.where(got_bid, win_row, col_owner)
        prices = jnp.where(got_bid, win_bid, prices)
        row_to_col = row_to_col.at[
            jnp.where(got_bid, win_row, n)
        ].set(cols, mode="drop")
        return prices, col_owner, row_to_col, it + 1

    init = (
        prices,
        jnp.full((m,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.int32(0),
    )
    prices, _, row_to_col, _ = lax.while_loop(cond, body, init)
    return prices, row_to_col


def auction_assignment(
    cost: jax.Array,
    eps_final: Optional[float] = None,
    scaling_factor: float = 5.0,
    max_rounds: int = 200_000,
) -> jax.Array:
    """ε-scaled Jacobi auction on device.  cost: (n, m), n <= m.  Returns
    row->col (n,).  Total cost is within n·ε_final of optimal."""
    cost = jnp.asarray(cost, jnp.float32)
    n, _ = cost.shape
    benefit = -cost
    rng = float(jnp.max(cost) - jnp.min(cost))
    if eps_final is None:
        eps_final = max(rng, 1e-6) / (10.0 * n)
    eps = max(rng / 2.0, eps_final)
    prices = jnp.zeros((cost.shape[1],))
    while True:
        prices, row_to_col = _auction_one_eps(benefit, prices, eps, max_rounds)
        if eps <= eps_final:
            return row_to_col
        eps = max(eps / scaling_factor, eps_final)
