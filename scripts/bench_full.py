"""Full benchmark matrix on TPU: every kernel on every reference target,
plus ESS-throughput — the evidence table behind bench.py's headline.

Writes BENCH.md.  Run: python scripts/run_with_path scripts/bench_full.py
(or PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_full.py)
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp

from adaptive_mcmc_tpu import run_mcmc
from adaptive_mcmc_tpu.experiments.runner import TARGETS, build_kernel
from adaptive_mcmc_tpu.infer.diagnostics import effective_sample_size

# reference single-chain CPU rates (BASELINE.md)
REFERENCE_RATES = {
    ("eight_schools", "arwmh"): 55_700.0,
    ("eight_schools", "asss"): 42_400.0,
    ("eight_schools", "nuts"): 10_400.0,
    ("diamonds", "asss"): 3_672.0,
    ("kidiq", "arwmh"): 5_803.0,
    ("kidiq", "asss"): 6_803.0,
}

CONFIGS = [
    # (target, kernel, n_chains, iters)
    ("eight_schools", "arwmh", 4096, 3000),
    ("eight_schools", "asss", 2048, 1000),
    ("eight_schools", "nuts", 1024, 200),
    ("kidiq", "arwmh", 4096, 3000),
    ("kidiq", "asss", 2048, 1000),
    ("diamonds", "arwmh", 1024, 500),
    ("diamonds", "asss", 512, 200),
]


def bench_one(target_name, kernel_name, n_chains, iters):
    target = TARGETS[target_name]()
    kernel = build_kernel(
        kernel_name, target, lr_decay=2.0 / 3.0, num_warmup=0
    )
    state = kernel.init(jax.random.PRNGKey(0), n_chains=n_chains)

    @jax.jit
    def blk(s):
        return jax.lax.fori_loop(0, iters, lambda _, x: kernel.step(x), s)

    state = blk(state)
    jax.block_until_ready(state.position)
    t0 = time.perf_counter()
    state = blk(state)
    jax.block_until_ready(state.position)
    dt = time.perf_counter() - t0
    rate = n_chains * iters / dt

    # ESS throughput: collect a short thinned run and measure ESS/sec
    n_collect = 200
    samples, _, _ = run_mcmc(
        kernel, jax.random.PRNGKey(1), num_warmup=0,
        num_samples=n_collect, n_chains=min(n_chains, 512),
        init_state=None,
    )
    ess = effective_sample_size(samples)  # per dim
    ess_min = float(jnp.min(ess))
    # scale: ess_min per (n_collect iters x chains) -> per second at `rate`
    chains_used = min(n_chains, 512)
    ess_per_iter_chain = ess_min / (n_collect * chains_used)
    ess_per_sec = ess_per_iter_chain * rate
    return rate, dt / iters * 1e6, ess_per_sec


def main():
    lines = [
        "# BENCH — kernel x target throughput on one TPU v5e chip",
        "",
        "| target | kernel | chains | chain-iters/s | us/iter | min-ESS/s | vs reference CPU |",
        "|---|---|---|---|---|---|---|",
    ]
    for target, kernel, n_chains, iters in CONFIGS:
        t0 = time.time()
        rate, us_per_iter, ess_rate = bench_one(target, kernel, n_chains, iters)
        ref = REFERENCE_RATES.get((target, kernel))
        vs = f"{rate / ref:,.0f}x" if ref else "—"
        line = (
            f"| {target} | {kernel} | {n_chains} | {rate:,.0f} | "
            f"{us_per_iter:.1f} | {ess_rate:,.0f} | {vs} |"
        )
        lines.append(line)
        print(line + f"   ({time.time()-t0:.0f}s)", flush=True)
    Path("BENCH.md").write_text("\n".join(lines) + "\n")
    print("written BENCH.md")


if __name__ == "__main__":
    main()
