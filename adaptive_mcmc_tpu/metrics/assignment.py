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
  (mean assigned cost within ε_final = range/(2n) of the exact 1-1
  Wasserstein by default) — the sweep-scale solver on this host (1 CPU
  core: the exact host Hungarian needs ~90 s/seed at n=10k; the auction
  runs the whole thing in TPU HBM).
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
    rows = jnp.arange(n, dtype=jnp.int32)

    def cond(val):
        _, _, row_to_col, it = val
        return jnp.any(row_to_col < 0) & (it < max_rounds)

    def body(val):
        # GATHER- AND SCATTER-FREE round: every per-column/per-row combine
        # is a dense masked reduction over a (block, ·) slice.  TPU lowers
        # scatters to serialized per-update loops (and vmapped scatters
        # serialize per lane), and it lowers element-indexed GATHERS the
        # same way — an xprof trace of the production shape (B=8, n=m=10k)
        # showed the three dynamic gathers of the previous displacement
        # logic costing ~2.3 ms of the ~2.7 ms round, independent of
        # block width.  The dense masks are plain VPU work at the same
        # O(block·m) traffic as the bid row-gather itself (which stays: a
        # contiguous-row gather lowers well, ~0.13 ms for (1024, 10k)).
        prices, col_owner, row_to_col, it = val
        unassigned = row_to_col < 0                      # (n,)
        # first `block` unassigned row indices, ascending, padded with n:
        # top_k of the negated masked iota — jnp.nonzero(size=block) lowers
        # to a serialized n-element scatter on TPU (xprof: 0.7 ms/round at
        # B=8, n=10k, the single hottest op); top_k is a native sort
        # network
        score = jnp.where(unassigned, rows, n)
        k = min(block, n)
        idx = (-lax.top_k(-score, k)[0]).astype(jnp.int32)  # ascending
        if k < block:  # static: pad to the block width with inert lanes
            idx = jnp.concatenate(
                [idx, jnp.full((block - k,), n, jnp.int32)]
            )
        valid = idx < n
        # padded lanes gather 0-benefit rows; their bids are masked below
        vals = (
            benefit.at[idx].get(mode="fill", fill_value=0.0)
            - prices[None, :]
        )                                                # (block, m)
        v1 = jnp.max(vals, axis=-1)
        j1 = jnp.argmax(vals, axis=-1).astype(jnp.int32)
        masked = jnp.where(cols[None, :] == j1[:, None], -jnp.inf, vals)
        v2 = jnp.max(masked, axis=-1)
        hit = cols[None, :] == j1[:, None]               # (block, m)
        # prices[j1] densely: v1 already is benefit[idx, j1] - prices[j1]
        p_j1 = jnp.max(jnp.where(hit, prices[None, :], -jnp.inf), axis=-1)
        bid = p_j1 + (v1 - v2) + eps
        bid = jnp.where(valid, bid, -jnp.inf)
        # best bid per column: dense masked column-max over the block
        bids_m = jnp.where(hit, bid[:, None], -jnp.inf)
        win_bid = jnp.max(bids_m, axis=0)                # (m,)
        got_bid = jnp.isfinite(win_bid)
        # winner among tied top bidders: lowest row index reaching the
        # column max (idx is ascending, so min-idx == first tied lane).
        # Dense min-reduce — `idx[argmax(...)]` was an (m,)-indexed gather
        # into idx, which TPU serializes (xprof: 0.4 ms/round, the last
        # block-independent op in the body)
        tied = bids_m >= win_bid[None, :]                # (block, m)
        win_row = jnp.min(jnp.where(tied, idx[:, None], n), axis=0)
        win_row = jnp.where(got_bid, win_row, n)         # (m,)
        # per-lane view of its column's outcome, via the SAME dense hit
        # mask (no gathers): did lane b's column change owner, and to whom
        new_owner_b = jnp.max(
            jnp.where(hit & got_bid[None, :], win_row[None, :], -1), axis=-1
        )                                                # (block,)
        # displace previous owners: row i is displaced iff some lane bid
        # its column (got_bid only arises from this round's lanes) and
        # the column's new owner is not i
        displ_hit = (
            (row_to_col[None, :] == j1[:, None])         # (block, n)
            & (new_owner_b >= 0)[:, None]
            & (new_owner_b[:, None] != rows[None, :])
        )
        displaced = jnp.any(displ_hit, axis=0)
        row_to_col = jnp.where(displaced, -1, row_to_col)
        # install winners densely: block lane b won column j1[b] iff the
        # column chose it back
        won = valid & (new_owner_b == idx)
        hit_row = won[:, None] & (idx[:, None] == rows[None, :])  # (block,n)
        new_col = jnp.max(
            jnp.where(hit_row, j1[:, None], -1), axis=0
        )                                                # (n,)
        row_to_col = jnp.where(new_col >= 0, new_col, row_to_col)
        col_owner = jnp.where(got_bid, win_row, col_owner)
        prices = jnp.where(got_bid, win_bid, prices)
        return prices, col_owner, row_to_col, it + 1

    init = (prices, col_owner, row_to_col, jnp.int32(0))
    prices, col_owner, row_to_col, _ = lax.while_loop(cond, body, init)
    return prices, col_owner, row_to_col


def _block_tier(left: int, block: int, rounds_per_call: int):
    """Block-width / per-call-round ladder shared by both host drivers.

    Round cost scales with block width now that the chunk body is
    gather-free, so match the block to the live pool: wide while everyone
    bids, then 128, then 16 for the war endgame where 1-3 rows fight for
    thousands of rounds at ~30 µs each.  Per-call round budgets keep each
    device program at ~0.2-1 s so the host re-tiers as the pool drains
    (the while cond only exits at left == 0, so an oversized wide call
    burns ms-rounds on a nearly-drained pool)."""
    if left > 128:
        return block, min(64, rounds_per_call)
    if left > 16:
        return min(128, block), min(1_024, rounds_per_call)
    return min(16, block), min(32_768, rounds_per_call)


def auction_assignment(
    cost: jax.Array,
    eps_final: Optional[float] = None,
    scaling_factor: float = 10.0,
    max_rounds: int = 4_000_000,
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
        # mean assigned cost within eps_final = range/(2n) of optimal
        # (5e-5·range at n=10k) — below the 1e-3 table precision — while
        # running ~3x faster than range/(10n) (fewer endgame price wars)
        eps_final = max(rng, 1e-6) / (2.0 * n)
    if prices_init is None:
        eps = max(rng / 2.0, eps_final)
        prices = jnp.zeros((m,))
    else:
        eps = eps_final * scaling_factor
        prices = jnp.asarray(prices_init, jnp.float32)
    # Endgame: the last few unassigned rows fight bidding wars whose
    # length scales like (value gap)/ε — thousands of rounds at small ε.
    # Round cost scales with block width now that the body is fully
    # gather-free (27 µs at block=16 vs 2.6 ms at block=1024 on the
    # n=10k production shape), so match the block to the live pool:
    # wide while everyone bids, then 128, then 16 for the war endgame
    # (measured: >80% of a cold n=10k solve is rounds with ≤4 live rows).
    while True:
        col_owner = jnp.full((m,), -1, jnp.int32)
        row_to_col = jnp.full((n,), -1, jnp.int32)
        spent = 0
        while spent < max_rounds:
            left = int(jnp.sum(row_to_col < 0))
            if left == 0:
                break
            blk, rounds = _block_tier(left, block, rounds_per_call)
            prices, col_owner, row_to_col = _auction_chunk(
                benefit, prices, col_owner, row_to_col, eps,
                rounds, blk,
            )
            spent += rounds
        if eps <= eps_final:
            if int(jnp.sum(row_to_col < 0)) > 0:
                # A partial assignment would silently corrupt the exact-W
                # value downstream (cost[i, -1] wraps to the last column).
                raise RuntimeError(
                    f"auction exhausted max_rounds={max_rounds} at "
                    f"eps_final with {int(jnp.sum(row_to_col < 0))} rows "
                    "unassigned — raise max_rounds or use the Hungarian "
                    "solver for this instance"
                )
            return (row_to_col, prices) if return_prices else row_to_col
        eps = max(eps / scaling_factor, eps_final)


@partial(jax.jit, static_argnames=("max_rounds", "block"))
def _auction_chunk_batch(benefit, prices, col_owner, row_to_col, eps,
                         max_rounds, block):
    return jax.vmap(
        lambda be, pr, co, rc: _auction_chunk(
            be, pr, co, rc, eps, max_rounds, block
        )
    )(benefit, prices, col_owner, row_to_col)


def auction_assignment_batch(
    costs: jax.Array,
    eps_final: Optional[float] = None,
    scaling_factor: float = 10.0,
    max_rounds: int = 4_000_000,
    block: int = 1024,
    rounds_per_call: Optional[int] = None,
    prices_init: Optional[jax.Array] = None,
    return_prices: bool = False,
) -> jax.Array:
    """ε-scaled auction over a BATCH of instances that share one ε
    schedule.  costs: (B, n, m).  Returns row->col (B, n), or
    (row->col, prices) when ``return_prices``.

    The sweep evals solve ~100 statistically identical instances (one
    per seed, all against the same reference set).  Solving them one at
    a time leaves the chip latency-bound: each auction round is a
    handful of gather/scatter ops over (block, m) slices whose fixed op
    overhead — not bandwidth — dominates at n=10k.  vmapping the round
    over B instances amortizes that overhead B ways; instances run the
    round loop in lockstep (a lane that finishes early no-ops until the
    slowest lane's ε level drains), which costs little because the
    instances are near-identical and need near-identical round counts.

    ``prices_init`` (B0, m) warm-starts the column duals per lane (same
    ε-CS argument as the single-instance solver: any initial prices are
    valid with an empty assignment, so the bound is unaffected).  B0 may
    differ from B — rows are tiled/truncated to fit, since all lanes
    solve against the same reference set.  A warm start skips the cold
    ε-scaling schedule (starts at eps_final·scaling_factor).

    ε_final uses the max cost range over the batch, so every instance
    gets at least the single-instance optimality bound."""
    costs = jnp.asarray(costs, jnp.float32)
    b, n, m = costs.shape
    if rounds_per_call is None:
        # cap only: the block-tier ladder already keeps each device
        # program at ~0.2-1 s of work (longer programs have tripped the
        # remote worker's watchdog)
        rounds_per_call = 32_768
    benefit = -costs
    rng = float(jnp.max(costs) - jnp.min(costs))
    if eps_final is None:
        eps_final = max(rng, 1e-6) / (2.0 * n)
    if prices_init is None:
        eps = max(rng / 2.0, eps_final)
        prices = jnp.zeros((b, m))
    else:
        eps = eps_final * scaling_factor
        p0 = jnp.asarray(prices_init, jnp.float32)
        reps = -(-b // p0.shape[0])  # ceil
        prices = jnp.tile(p0, (reps, 1))[:b]
    while True:
        col_owner = jnp.full((b, m), -1, jnp.int32)
        row_to_col = jnp.full((b, n), -1, jnp.int32)
        spent = 0
        while spent < max_rounds:
            # lanes run rounds in lockstep, so the widest lane picks the
            # block size (see auction_assignment for the endgame logic)
            left = int(jnp.max(jnp.sum(row_to_col < 0, axis=1)))
            if left == 0:
                break
            blk, rounds = _block_tier(left, block, rounds_per_call)
            prices, col_owner, row_to_col = _auction_chunk_batch(
                benefit, prices, col_owner, row_to_col,
                jnp.float32(eps), rounds, blk,
            )
            spent += rounds
        if eps <= eps_final:
            bad = int(jnp.sum(jnp.any(row_to_col < 0, axis=1)))
            if bad > 0:
                raise RuntimeError(
                    f"batched auction exhausted max_rounds={max_rounds} at "
                    f"eps_final with {bad} instances incomplete — raise "
                    "max_rounds or use the Hungarian solver"
                )
            return (row_to_col, prices) if return_prices else row_to_col
        eps = max(eps / scaling_factor, eps_final)
