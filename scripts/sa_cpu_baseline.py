"""Measure this framework's OWN single-chain CPU SA rate, to serve as an
honest bench denominator (VERDICT r3 #5): the reference never records an
SA rate (numpyro_kernels.py:16-73 wraps NumPyro SA but no notebook cell
times it), so bench.py's SA extra previously divided by the reference's
ASSS rate as a flagged proxy.  This script times the same SA kernel the
TPU bench runs, single chain, on this host's CPU — the same
"single-chain laptop-class CPU" setting the other baselines come from.

Run:  python scripts/sa_cpu_baseline.py   (prints one JSON line)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from adaptive_mcmc_tpu import models
from adaptive_mcmc_tpu.kernels.sa import SAConfig, sa


def main():
    es = models.eight_schools_noncentered()
    kernel = sa(es, SAConfig())
    state = kernel.init(jax.random.PRNGKey(0), n_chains=1)
    step_n = getattr(kernel, "step_n", None)
    n = 5_000

    if step_n is not None:
        run = jax.jit(lambda s: step_n(s, n))
    else:
        run = jax.jit(
            lambda s: jax.lax.fori_loop(0, n, lambda _, x: kernel.step(x), s)
        )
    state = run(state)  # compile + adapt warm
    jax.block_until_ready(state.position)
    t0 = time.perf_counter()
    blocks = 3
    for _ in range(blocks):
        state = run(state)
    jax.block_until_ready(state.position)
    rate = blocks * n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "sa_eight_schools_cpu_1chain",
        "value": round(rate, 1),
        "unit": "chain_iters_per_sec",
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
