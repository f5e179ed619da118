"""Linear sum assignment solvers for the exact 1-1 Wasserstein coupling.

Three backends behind one dispatch (cheapest-correct first):

* ``native`` — in-repo C++ Hungarian solver (``_native/lsap.cpp``), built on
  first use with ``make`` and loaded through ctypes.  Exact, host-side, and
  the fastest exact option at the n=10k scale the eval scripts use.
* ``scipy`` — ``scipy.optimize.linear_sum_assignment`` fallback (exact).
* ``auction`` — a JAX Bertsekas auction with ε-scaling and block bidding
  that runs ON DEVICE: each round is a top-2 reduction over a
  (block, m) slice of the cost matrix, so work tracks the number of bids
  and the O(n²) cost matrix never ships to the host.  ε-approximate
  (mean assigned cost within ε_final ≈ range/(10n) of the exact 1-1
  Wasserstein) — the sweep-scale solver on this host (1 CPU core: the
  exact host Hungarian needs ~90 s/seed at n=10k; the auction runs the
  whole thing in TPU HBM).
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

@partial(jax.jit, static_argnames=("max_rounds", "block"))
def _auction_chunk(benefit, prices, col_owner, row_to_col, eps, max_rounds,
                   block=1024):
    """Run up to ``max_rounds`` auction rounds at one ε with BLOCK bidding:
    each round gathers up to ``block`` unassigned rows and only those rows
    bid (top-2 reduction over a (block, m) slice), each column keeps the
    best bid, displaced rows re-enter the pool.

    Why blocks: the total work of an ε-scaled auction is proportional to
    the number of bids, which is ~O(n) per ε level in practice — but a
    naive all-rows Jacobi round costs O(n·m) even when a single row is
    left bidding, turning the endgame into thousands of full-matrix
    passes (measured minutes per n=10k solve).  Block rounds cost
    O(block·m), so total traffic tracks the bid count.

    Why chunks: one unbounded while_loop program can run for minutes and
    trip the device watchdog (observed: remote TPU worker crash on the
    dense variant); callers re-enter with the carried state instead."""
    n, m = benefit.shape
    cols = jnp.arange(m, dtype=jnp.int32)
    brange = jnp.arange(block)

    def cond(val):
        _, _, row_to_col, it = val
        return jnp.any(row_to_col < 0) & (it < max_rounds)

    def body(val):
        prices, col_owner, row_to_col, it = val
        unassigned = row_to_col < 0                      # (n,)
        idx = jnp.nonzero(unassigned, size=block, fill_value=n)[0].astype(
            jnp.int32
        )                                                # (block,)
        valid = idx < n
        # padded lanes gather 0-benefit rows; their bids are masked below
        vals = (
            benefit.at[idx].get(mode="fill", fill_value=0.0)
            - prices[None, :]
        )                                                # (block, m)
        v1 = jnp.max(vals, axis=-1)
        j1 = jnp.argmax(vals, axis=-1).astype(jnp.int32)
        v2 = jnp.max(vals.at[brange, j1].set(-jnp.inf), axis=-1)
        bid = prices[j1] + (v1 - v2) + eps
        bid = jnp.where(valid, bid, -jnp.inf)
        # best bid per column via scatter-max
        win_bid = jnp.full((m,), -jnp.inf).at[j1].max(bid)
        got_bid = jnp.isfinite(win_bid)
        # deterministic winner among tied top bidders: lowest row index
        is_win = valid & (bid >= win_bid[j1])
        win_row = (
            jnp.full((m,), n, jnp.int32)
            .at[jnp.where(is_win, j1, m)]
            .min(idx, mode="drop")
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

    init = (prices, col_owner, row_to_col, jnp.int32(0))
    prices, col_owner, row_to_col, _ = lax.while_loop(cond, body, init)
    return prices, col_owner, row_to_col


def auction_assignment(
    cost: jax.Array,
    eps_final: Optional[float] = None,
    scaling_factor: float = 5.0,
    max_rounds: int = 400_000,
    block: int = 1024,
    rounds_per_call: int = 8_192,
    prices_init: Optional[jax.Array] = None,
    return_prices: bool = False,
):
    """ε-scaled auction on device.  cost: (n, m), n <= m.  Returns
    row->col (n,), or (row->col, prices) when ``return_prices``.  Total
    cost is within n·ε_final of optimal (mean assigned cost within
    ε_final of the exact 1-1 Wasserstein).

    ``prices_init`` warm-starts the column duals.  The auction maintains
    ε-CS from ANY initial prices given an empty initial assignment
    (Bertsekas 1988, §4), so warm starts do not weaken the optimality
    bound — they only change how many bids are needed.  Sweeps that
    solve many sample sets against one fixed reference set reuse the
    previous solve's prices and skip the cold ε-scaling schedule
    entirely (one backup ε level absorbs a poor warm start); measured
    ~5-10x fewer rounds at n=10k on consecutive eval seeds.

    Each device program is bounded at ``rounds_per_call`` rounds; the
    (prices, assignment) carry is re-entered from the host so a hard
    instance can never wedge the chip."""
    cost = jnp.asarray(cost, jnp.float32)
    n, m = cost.shape
    benefit = -cost
    rng = float(jnp.max(cost) - jnp.min(cost))
    if eps_final is None:
        # mean assigned cost within eps_final of optimal; range/(2n) keeps
        # the error ~2e-4·range — below the 1e-3 table precision — while
        # running ~3x faster than range/(10n) (fewer endgame price wars)
        eps_final = max(rng, 1e-6) / (2.0 * n)
    if prices_init is None:
        eps = max(rng / 2.0, eps_final)
        prices = jnp.zeros((m,))
    else:
        eps = eps_final * scaling_factor
        prices = jnp.asarray(prices_init, jnp.float32)
    while True:
        col_owner = jnp.full((m,), -1, jnp.int32)
        row_to_col = jnp.full((n,), -1, jnp.int32)
        spent = 0
        while spent < max_rounds:
            prices, col_owner, row_to_col = _auction_chunk(
                benefit, prices, col_owner, row_to_col, eps,
                rounds_per_call, block,
            )
            spent += rounds_per_call
            if not bool(jnp.any(row_to_col < 0)):
                break
        if eps <= eps_final:
            return (row_to_col, prices) if return_prices else row_to_col
        eps = max(eps / scaling_factor, eps_final)
