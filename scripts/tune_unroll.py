"""Measure the pipelined drivers' step rate vs body-unroll factor K at
the w_eval sweep shape (100 chains, eight-schools).

The pipelined step_n drivers (kernels/asss.py, kernels/nuts.py) unroll K
body iterations per `lax.while_loop` trip: larger K amortizes the loop's
carry shuffle + condition check, smaller K wastes less tail work.  The
dataclass defaults (ASSS 4, NUTS 2) were chosen analytically while the
TPU tunnel was down — this probe measures the real curve so the sweep
can pin AMT_PIPELINE_UNROLL (read by experiments/runner.build_kernel).

Run:  python scripts/tune_unroll.py          (~5 min, mostly compiles)
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from adaptive_mcmc_tpu import ASSSConfig, asss, models  # noqa: E402
from adaptive_mcmc_tpu.kernels.nuts import NUTSConfig, nuts  # noqa: E402


def rate(kernel, n_chains, warm, steps):
    state = kernel.init(jax.random.PRNGKey(0), n_chains=n_chains)
    state = jax.block_until_ready(kernel.step_n(state, warm))
    run = jax.jit(lambda s: kernel.step_n(s, steps))
    state = jax.block_until_ready(run(state))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        best = min(best, time.perf_counter() - t0)
    return n_chains * steps / best


def main():
    es = models.eight_schools_noncentered()
    for name, build, cfg_cls, warm, steps in (
        ("asss", asss, ASSSConfig, 2_000, 5_000),
        ("nuts", nuts, NUTSConfig, 400, 500),
    ):
        for k in (1, 2, 4, 8):
            cfg = dataclasses.replace(
                cfg_cls(num_warmup=warm), pipeline_unroll=k
            )
            r = rate(build(es, cfg), 100, warm, steps)
            print(f"[{name}] K={k}: {r:,.0f} chain-iters/s "
                  f"({1e6 * 100 / r:.1f} us/step @100 chains)", flush=True)

    # fused whole-sweep Pallas ASSS (first hardware measurement; also
    # its first compiled-mode correctness signal — compare the rate AND
    # sanity of the state against the XLA driver before enabling
    # AMT_ASSS_FUSED for sweeps)
    try:
        cfg = ASSSConfig(num_warmup=2_000, fused=True)
        r = rate(asss(es, cfg), 100, 2_000, 5_000)
        print(f"[asss-FUSED] {r:,.0f} chain-iters/s "
              f"({1e6 * 100 / r:.1f} us/step @100 chains)", flush=True)
        for C in (1024, 4096):
            r = rate(asss(es, cfg), C, 1_000, 1_000)
            print(f"[asss-FUSED] C={C}: {r:,.0f} chain-iters/s", flush=True)
    except Exception as exc:
        print(f"[asss-FUSED] FAILED: {exc}", flush=True)


if __name__ == "__main__":
    main()
