"""Multi-kernel benchmark: batched adaptive MCMC on one TPU chip.

Covers the three kernels of the reference's headline throughput table
(posteriordb_eight-schools.ipynb cells 27-29; BASELINE.md) plus the
diamonds ASSS row (posteriordb_diamonds.ipynb cell 51) so ASSS/NUTS
regressions are visible to the driver, not just the ARWMH headline
(VERDICT round 1, weak #4).

Prints ONE JSON line.  Primary metric stays the round-1 headline
(4096-chain adaptive ARWMH on eight-schools vs the reference's 55.7k
iters/sec laptop-CPU rate); the other kernels ride in "extras", each
with its own reference baseline.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from adaptive_mcmc_tpu import ARWMHConfig, ASSSConfig, arwmh, asss, models
from adaptive_mcmc_tpu.kernels.nuts import NUTSConfig, nuts
from adaptive_mcmc_tpu.kernels.sa import SAConfig, sa

# Reference rates (single chain, author's laptop CPU; BASELINE.md).
BASE_ARWMH_ES = 55_700.0   # eight-schools ARWMH, ipynb cell 28
BASE_ASSS_ES = 42_400.0    # eight-schools ASSS, cell 29
BASE_NUTS_ES = 10_400.0    # eight-schools NUTS, cell 27
BASE_ASSS_DIAMONDS = 3_672.0  # diamonds ASSS, diamonds ipynb cell 51
# The reference exposes SA only as a kernel baseline and never records a
# rate for it (numpyro_kernels.py:16-73, no notebook cell).  The SA
# denominator is therefore an IN-REPO measurement: this framework's own SA
# kernel, single chain, on this host's CPU (scripts/sa_cpu_baseline.py,
# 2026-08-18: 9,112.9 chain-iters/s) — the same single-chain-CPU setting
# the other baselines come from.  Note SA's transition is ~N=102x heavier
# than ARWMH's (one ensemble of max(102, 2d) points per chain, N
# leave-one-out covariance factors per step), so its chain-iters/s is not
# comparable across kernels, only across platforms.
BASE_SA_CPU = 9_112.9


def time_kernel(kernel, n_chains, *, warmup_steps, timed_steps, n_blocks=3,
                block=None, accept_field=None):
    """Steady-state chain-iters/sec: run `warmup_steps` first (adaptation
    warm + compile), then time `n_blocks` blocks of `timed_steps`."""
    state = kernel.init(jax.random.PRNGKey(0), n_chains=n_chains)

    # Time the production driver: kernels with a pipelined multi-step
    # step_n (ASSS, NUTS) are advanced through it — that is what the
    # sweep runners execute — others via a fori of the lockstep step.
    step_n = getattr(kernel, "step_n", None)

    def run_n(n):
        if step_n is not None:
            return jax.jit(lambda state: step_n(state, n))

        @jax.jit
        def body(state):
            return jax.lax.fori_loop(0, n, lambda _, s: kernel.step(s), state)
        return body

    warm = run_n(warmup_steps)
    timed = run_n(timed_steps)
    state = warm(state)
    state = timed(state)  # compile the timed block too
    jax.block_until_ready(state.position)

    t0 = time.perf_counter()
    for _ in range(n_blocks):
        state = timed(state)
    jax.block_until_ready(state.position)
    elapsed = time.perf_counter() - t0
    rate = n_chains * timed_steps * n_blocks / elapsed

    if accept_field is not None:
        accept = float(jnp.mean(getattr(state, accept_field)))
        if not (0.05 < accept < 0.99):
            print(f"WARNING: {kernel.name} acceptance {accept:.3f} "
                  f"out of range", file=sys.stderr)
    return rate


def main() -> None:
    profile_dir = os.environ.get("AMT_PROFILE_DIR")  # optional xprof trace
    es = models.eight_schools_noncentered()
    diamonds = models.diamonds()

    from adaptive_mcmc_tpu.utils import trace

    def safe(tag, fn, fallback=None):
        """One kernel's failure must not cost the whole benchmark.  Two
        distinct failure modes are handled: a code regression in an
        opt-in path (-> `fallback`, e.g. fused drivers disabled) and a
        TRANSIENT device/tunnel outage (the axon RPC tunnel can drop for
        a minute and every kernel would record 0.0 for the round, as
        nearly happened 2026-08-19) -> sleep and retry the same fn."""
        last = None
        for attempt in range(3):
            try:
                return fn()
            except Exception as exc:  # pragma: no cover - hw-dependent
                last = exc
                print(f"BENCH WARNING: {tag} attempt {attempt + 1} "
                      f"failed ({exc!r})", file=sys.stderr)
                time.sleep(20 * (attempt + 1))
        if fallback is not None:
            print(f"BENCH WARNING: {tag} retrying with fused drivers "
                  f"disabled", file=sys.stderr)
            try:
                return fallback()
            except Exception as exc2:
                print(f"BENCH WARNING: {tag} fallback failed "
                      f"({exc2!r})", file=sys.stderr)
        print(f"BENCH WARNING: {tag} gave up ({last!r})", file=sys.stderr)
        return float("nan")

    with trace(profile_dir):
        arwmh_rate = safe(
            "arwmh",
            lambda: time_kernel(
                arwmh(es, ARWMHConfig(num_warmup=0)), 4096,
                warmup_steps=1000, timed_steps=1000, n_blocks=5,
                accept_field="mean_accept_prob",
            ),
            fallback=lambda: time_kernel(
                arwmh(es, ARWMHConfig(num_warmup=0, fused=False)), 4096,
                warmup_steps=1000, timed_steps=1000, n_blocks=5,
                accept_field="mean_accept_prob",
            ),
        )
        asss_rate = safe(
            "asss",
            lambda: time_kernel(
                asss(es, ASSSConfig(num_warmup=0)), 4096,
                warmup_steps=500, timed_steps=500,
            ),
            fallback=lambda: time_kernel(
                asss(es, ASSSConfig(num_warmup=0, fused=False)), 4096,
                warmup_steps=500, timed_steps=500,
            ),
        )
        nuts_rate = safe("nuts", lambda: time_kernel(
            nuts(es, NUTSConfig(num_warmup=400)), 1024,
            warmup_steps=400, timed_steps=100,
        ))
        asss_dia_rate = safe("asss_diamonds", lambda: time_kernel(
            asss(diamonds, ASSSConfig(num_warmup=0)), 1024,
            warmup_steps=300, timed_steps=300,
        ))
        sa_rate = safe("sa", lambda: time_kernel(
            sa(es, SAConfig()), 1024,
            warmup_steps=300, timed_steps=300,
        ))

    def val(r):
        # json.dumps would emit invalid bare NaN for a failed kernel
        return round(r, 1) if r == r else 0.0

    # Sweep-measured ESS/sec per w_eval cell (VERDICT r3 #4): per-seed
    # Geyer ESS over the reference-budget sweep divided by its warm
    # sampling wall — quality-adjusted throughput, from the same
    # artifacts RESULTS.md tabulates.  Loaded once for all entries.
    try:
        state_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "mcmc_runs", "results_state.json")
        with open(state_path) as f:
            _sweep_state = json.load(f)
    except Exception:
        _sweep_state = {}

    def ess_per_sec(cell):
        v = _sweep_state.get(cell, {}).get("ess_per_sec")
        return round(float(v), 1) if v is not None else None

    extras = [
        {"metric": "asss_eight_schools_4096chains",
         "value": val(asss_rate), "unit": "chain_iters_per_sec",
         "vs_baseline": round(asss_rate / BASE_ASSS_ES, 2) if asss_rate == asss_rate else 0.0,
         "ess_per_sec": ess_per_sec("eight_schools|asss")},
        {"metric": "nuts_eight_schools_1024chains",
         "value": val(nuts_rate), "unit": "chain_iters_per_sec",
         "vs_baseline": round(nuts_rate / BASE_NUTS_ES, 2) if nuts_rate == nuts_rate else 0.0,
         "ess_per_sec": ess_per_sec("eight_schools|nuts")},
        {"metric": "asss_diamonds_1024chains",
         "value": val(asss_dia_rate), "unit": "chain_iters_per_sec",
         "vs_baseline": round(asss_dia_rate / BASE_ASSS_DIAMONDS, 2) if asss_dia_rate == asss_dia_rate else 0.0,
         "ess_per_sec": ess_per_sec("diamonds|asss")},
        {"metric": "sa_eight_schools_1024chains",
         "value": val(sa_rate), "unit": "chain_iters_per_sec",
         "vs_baseline": round(sa_rate / BASE_SA_CPU, 2) if sa_rate == sa_rate else 0.0,
         "ess_per_sec": ess_per_sec("eight_schools|sa"),
         "baseline_note": "no reference-recorded SA rate exists; "
                          "denominator is this framework's own "
                          "single-chain CPU SA rate (9,113 it/s, "
                          "scripts/sa_cpu_baseline.py) — each SA "
                          "chain-iter updates a 102-point ensemble"},
    ]
    result = {
        "metric": "arwmh_eight_schools_4096chains",
        "value": val(arwmh_rate),
        "unit": "chain_iters_per_sec",
        "vs_baseline": round(arwmh_rate / BASE_ARWMH_ES, 2) if arwmh_rate == arwmh_rate else 0.0,
        "ess_per_sec": ess_per_sec("eight_schools|arwmh"),
        "ess_note": "ess_per_sec fields are sweep-measured: "
                    "Geyer ESS over the matching reference-budget "
                    "w_eval cell / its warm wall "
                    "(mcmc_runs/results_state.json; RESULTS.md)",
        "extras": extras,
    }
    print(json.dumps(result))
    # persist for scripts/stamp_docs.py (VERDICT r4 weak #4: README's
    # headline numbers must be generated from artifacts, not hand-typed)
    try:
        import time as _time

        snap = dict(result)
        snap["measured_utc"] = _time.strftime(
            "%Y-%m-%d", _time.gmtime())
        snap["platform"] = jax.devices()[0].platform
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "mcmc_runs", "bench_latest.json"), "w") as f:
            json.dump(snap, f, indent=1)
    except Exception:
        pass  # the JSON line on stdout is the contract; the snapshot is aux


if __name__ == "__main__":
    main()
