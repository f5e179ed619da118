"""Per-step cost breakdown on the real TPU chip -> PERF.md.

Ablation-based decomposition (jax.profiler traces are captured by bench.py
when AMT_PROFILE_DIR is set; this script turns the same programs into a
reviewable table): for each kernel on eight-schools, time

  * the full adaptive step,
  * the frozen-adaptation step (adapt=False / post-warmup NUTS),
  * the raw batched potential (+grad for NUTS) evaluation,

at the bench chain counts.  The differences attribute the step cost to
adaptation math vs proposal/accept vs log-density work.

Run:  python scripts/perf_breakdown.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from adaptive_mcmc_tpu import (  # noqa: E402
    ARWMHConfig,
    ASSSConfig,
    arwmh,
    asss,
    models,
)
from adaptive_mcmc_tpu.kernels.nuts import NUTSConfig, nuts  # noqa: E402


def time_steps(kernel, n_chains, steps, reps=3, state=None):
    """Steady-state s/step.  ``state`` lets callers time a kernel variant
    from an already-adapted state (freezing adaptation from a cold state
    would change the DYNAMICS — unadapted geometry costs more shrinkage
    trips / deeper trees — not just skip the adaptation math)."""
    if state is None:
        state = kernel.init(jax.random.PRNGKey(0), n_chains=n_chains)

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, steps, lambda _, s: kernel.step(s), state)

    state = jax.block_until_ready(run(state))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = run(state)
        jax.block_until_ready(state.position)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best  # seconds per step (all chains)


def time_potential(target, n_chains, grad=False, reps=3, iters=3000):
    f = target.potential_fn
    if grad:
        f = jax.value_and_grad(f)
    bf = jax.vmap(f)

    @jax.jit
    def run(x):
        def body(_, x):
            out = bf(x)
            pe = out[0] if grad else out
            return x + 0.0 * pe[:, None] + (0.0 * out[1] if grad else 0.0)

        return jax.lax.fori_loop(0, iters, body, x)

    x = jnp.zeros((n_chains, target.dim))
    jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    es = models.eight_schools_noncentered()
    rows = []

    for name, build, cfg, chains, grad in (
        ("arwmh", arwmh, ARWMHConfig, 4096, False),
        ("asss", asss, ASSSConfig, 4096, False),
        ("nuts", nuts, NUTSConfig, 1024, True),
    ):
        steps = 600 if name == "nuts" else 5000
        k_full = build(es, cfg(num_warmup=0))
        state = k_full.init(jax.random.PRNGKey(0), n_chains=chains)

        @jax.jit
        def adapt_in(state):
            return jax.lax.fori_loop(
                0, 2000, lambda _, s: k_full.step(s), state
            )

        state = jax.block_until_ready(adapt_in(state))
        full = time_steps(k_full, chains, steps=steps, state=state)
        if name == "nuts":
            frozen_cfg = cfg(
                num_warmup=0, adapt_step_size=False, adapt_mass_matrix=False,
            )
        else:
            frozen_cfg = cfg(num_warmup=0, adapt=False)
        # same state namedtuple — the frozen variant continues from the
        # adapted geometry and differs only in skipped adaptation math
        k_frozen = build(es, frozen_cfg)
        frozen = time_steps(k_frozen, chains, steps=steps, state=state)
        pot = time_potential(es, chains, grad=grad)
        # ASSS: per-chain mean shrinkage trips under both configs from the
        # SAME adapted state (VERDICT r3 weak #6 — the round-3 anomaly was
        # frozen-from-cold-state changing the trip DISTRIBUTION, not the
        # adaptation math being slower)
        trips_full = trips_frozen = None
        if getattr(k_full, "probe", None) is not None:
            _, tf = jax.block_until_ready(k_full.probe(state, 500))
            _, tz = jax.block_until_ready(k_frozen.probe(state, 500))
            trips_full = float(jnp.mean(tf))
            trips_frozen = float(jnp.mean(tz))
        rows.append((name, chains, full, frozen, pot,
                     trips_full, trips_frozen))

    # production pipelined drivers (step_n/collect_n) at the w_eval sweep
    # shape (100 chains = 100 seeds x 1 chain) — the config the RESULTS
    # walls are made of, where per-step dispatch dominates
    drv_rows = []
    for name, build, cfg, warm, steps in (
        ("arwmh", arwmh, ARWMHConfig, 5_000, 20_000),
        ("asss", asss, ASSSConfig, 2_000, 5_000),
        ("nuts", nuts, NUTSConfig, 400, 500),
    ):
        k = build(es, cfg(num_warmup=warm))
        step_n = getattr(k, "step_n", None)
        if step_n is None:
            continue
        state = k.init(jax.random.PRNGKey(0), n_chains=100)
        # adapt through the kernel's own warmup window so the timed
        # steps run on post-warmup geometry (trip counts / tree depths
        # at their steady-state distribution)
        state = jax.block_until_ready(step_n(state, warm))
        run = jax.jit(lambda s, n=steps: step_n(s, n))
        state = jax.block_until_ready(run(state))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state = run(state)
            jax.block_until_ready(state.position)
            best = min(best, (time.perf_counter() - t0) / steps)
        drv_rows.append((name, best))

    lines = [
        "Ablation decomposition of one kernel transition (best of 3 timed",
        "blocks, steady state, compile excluded; frozen variants continue",
        "from the SAME adapted state so only the adaptation math differs,",
        "not the dynamics).  `adaptation` is full − frozen;",
        "`proposal+accept` is frozen − potential.",
        "",
        "| kernel | chains | full step | frozen step | potential eval |"
        " adaptation share | trips/step (full/frozen) "
        "| chain-iters/s (full) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, chains, full, frozen, pot, t_full, t_frozen in rows:
        share = (
            f"{100*(full-frozen)/full:.0f}%" if name == "arwmh" else "—"
        )
        trips = (
            f"{t_full:.2f} / {t_frozen:.2f}" if t_full is not None else "—"
        )
        lines.append(
            f"| {name} | {chains} | {full*1e6:.1f} µs | {frozen*1e6:.1f} µs "
            f"| {pot*1e6:.1f} µs | {share} | {trips} "
            f"| {chains/full:,.0f} |"
        )
    if drv_rows:
        lines += [
            "",
            "Production drivers (pipelined `step_n`, adaptive, 100 chains "
            "= the w_eval sweep shape; per-chain transitions interleave so "
            "s/step is amortized, not max-over-chains):",
            "",
            "| kernel | s/step (100 chains) | chain-iters/s |",
            "|---|---|---|",
        ]
        for name, best in drv_rows:
            lines.append(
                f"| {name} | {best*1e6:.1f} µs | {100/best:,.0f} |"
            )
    lines += [
        "",
        "Notes:",
        "* NUTS rows time whole transitions (full trajectory per step, "
        "lockstep across chains); its potential row includes the gradient.",
        "* the adaptation share is only decomposable for ARWMH: ASSS and "
        "NUTS step cost is dominated by the data-dependent max-over-"
        "chains shrinkage-trip / tree-depth count, whose window-to-window "
        "variance exceeds the adaptation math being ablated.  The ASSS "
        "trips column (kernel.probe, same adapted start state, 500 "
        "steps) explains the frozen>full anomaly: ASSS adaptation is "
        "not just scale tuning — the moving loc keeps the "
        "stereographic projection centered on each chain, and freezing "
        "it lets chains drift off-center, costing ~4x more shrinkage "
        "trips per transition.  full − frozen is therefore NOT an "
        "adaptation-cost measurement for ASSS; the trip ratio is the "
        "real story.",
        "* capture an xprof trace of the same programs with "
        "`AMT_PROFILE_DIR=/tmp/xprof python bench.py` (utils/profiling.py "
        "wraps jax.profiler).",
    ]
    _write_perf_section("\n".join(lines) + "\n")


_BEGIN = "<!-- BEGIN GENERATED: perf_breakdown -->"
_END = "<!-- END GENERATED: perf_breakdown -->"
_HEADER = ("# PERF — per-step cost breakdown "
           "(eight-schools, one TPU v5e chip)")


def _write_perf_section(body: str):
    """Replace only the generated block of PERF.md, preserving the
    manually-authored sections (diamonds suff-stats A/B, fused-Pallas A/B
    + end state) that live outside the markers."""
    path = Path("PERF.md")
    block = f"{_BEGIN}\n{body}{_END}"
    print(body, end="")
    if path.exists():
        text = path.read_text()
        if _BEGIN in text and _END in text:
            pre, rest = text.split(_BEGIN, 1)
            _, post = rest.split(_END, 1)
            path.write_text(pre + block + post)
            return
    path.write_text(f"{_HEADER}\n\n{block}\n")


if __name__ == "__main__":
    main()
