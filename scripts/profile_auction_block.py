"""Measure auction war-round cost vs block size at the production shape.

Sets up a near-assigned state (real warm-start flow), then times
_auction_chunk_batch calls at several block widths during the endgame.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from adaptive_mcmc_tpu.experiments.evaluate import (  # noqa: E402
    get_reference_draws,
)
from adaptive_mcmc_tpu.metrics.assignment import (  # noqa: E402
    _auction_chunk_batch,
)
from adaptive_mcmc_tpu.metrics.wasserstein import (  # noqa: E402
    minkowski_cost_matrix,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    with np.load("mcmc_runs/w_eval/eight_schools/asss.npz",
                 allow_pickle=False) as d:
        samples = d["samples"]
    ref = np.asarray(get_reference_draws("eight_schools"))
    n = min(samples.shape[1], ref.shape[0])
    y = jnp.asarray(ref[:n])
    costs = jnp.stack([
        minkowski_cost_matrix(jnp.asarray(samples[s, :n]), y)
        for s in range(B)
    ])
    benefit = -costs
    rng = float(jnp.max(costs) - jnp.min(costs))
    eps_final = rng / (2.0 * n)

    # run the wide phase to a near-assigned state at eps_final
    prices = jnp.zeros((B, n))
    col_owner = jnp.full((B, n), -1, jnp.int32)
    row_to_col = jnp.full((B, n), -1, jnp.int32)
    prices, col_owner, row_to_col = _auction_chunk_batch(
        benefit, prices, col_owner, row_to_col, jnp.float32(eps_final),
        512, 1024,
    )
    left = np.asarray(jnp.sum(row_to_col < 0, axis=1))
    print(f"B={B} after wide phase: left={left.tolist()}", flush=True)

    # time war rounds at several block widths from the SAME state
    for blk in (128, 32, 8):
        for rounds in (2048,):
            # compile
            out = _auction_chunk_batch(
                benefit, prices, col_owner, row_to_col,
                jnp.float32(eps_final), 8, blk,
            )
            jax.block_until_ready(out[2])
            t0 = time.perf_counter()
            p2, c2, r2 = _auction_chunk_batch(
                benefit, prices, col_owner, row_to_col,
                jnp.float32(eps_final), rounds, blk,
            )
            jax.block_until_ready(r2)
            dt = time.perf_counter() - t0
            left2 = np.asarray(jnp.sum(r2 < 0, axis=1))
            print(f"block={blk:4d} rounds={rounds}: wall={dt:.3f}s "
                  f"({dt/rounds*1e3:.3f} ms/round) left_out={left2.tolist()}",
                  flush=True)


if __name__ == "__main__":
    main()
