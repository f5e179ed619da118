"""Headline benchmark: 4096-chain adaptive ARWMH on eight-schools (d=10).

Reference baseline: 55.7k iters/sec single-chain on the author's laptop CPU
(posteriordb_eight-schools.ipynb cell 28; BASELINE.md).  North star
(BASELINE.json): >= 100x reference chains x iters/sec at 4096 chains with
matching ESS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "chain_iters_per_sec", "vs_baseline": N}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from adaptive_mcmc_tpu import ARWMHConfig, arwmh, models

BASELINE_ITERS_PER_SEC = 55_700.0  # reference ARWMH, eight-schools, CPU


def main() -> None:
    import os

    n_chains = 4096
    iters_per_block = 1000
    profile_dir = os.environ.get("AMT_PROFILE_DIR")  # optional xprof trace
    target = models.eight_schools_noncentered()
    kernel = arwmh(target, ARWMHConfig(num_warmup=0))

    state = kernel.init(jax.random.PRNGKey(0), n_chains=n_chains)

    @jax.jit
    def run_block(state):
        return jax.lax.fori_loop(
            0, iters_per_block, lambda _, s: kernel.step(s), state
        )

    # compile + warm up adaptation
    state = run_block(state)
    jax.block_until_ready(state.position)

    from adaptive_mcmc_tpu.utils import trace

    n_blocks = 5
    with trace(profile_dir):
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            state = run_block(state)
        jax.block_until_ready(state.position)
        elapsed = time.perf_counter() - t0

    total_chain_iters = n_chains * iters_per_block * n_blocks
    rate = total_chain_iters / elapsed

    # sanity: sampler is actually mixing (acceptance in a sane band)
    accept = float(jnp.mean(state.mean_accept_prob))
    if not (0.05 < accept < 0.95):
        print(
            f"WARNING: acceptance rate {accept:.3f} out of range",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "arwmh_eight_schools_4096chains",
                "value": round(rate, 1),
                "unit": "chain_iters_per_sec",
                "vs_baseline": round(rate / BASELINE_ITERS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
