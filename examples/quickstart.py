"""Quickstart: the reference's eight-schools notebook workflow
(posteriordb_eight-schools.ipynb) as a script.

Run: PYTHONPATH=/root/.axon_site:. python examples/quickstart.py
"""

import jax
import jax.numpy as jnp

import adaptive_mcmc_tpu as amt

# --- target + kernels ------------------------------------------------------
target = amt.eight_schools_noncentered()

runs = {}
for name, build, budget in [
    ("nuts", amt.nuts, dict(num_warmup=1000, num_samples=4000, thinning=4)),
    ("arwmh", amt.arwmh, dict(num_warmup=5000, num_samples=20000, thinning=20)),
    ("asss", amt.asss, dict(num_warmup=2500, num_samples=10000, thinning=10)),
]:
    mcmc = amt.MCMC(build(target), n_chains=32, **budget)
    mcmc.run(jax.random.PRNGKey(0), extra_fields=("potential_energy",))
    print(f"\n=== {name}:  {mcmc.diagnostics_str()}")
    mcmc.print_summary()
    runs[name] = mcmc

# --- sample-quality metrics against the NUTS run ---------------------------
from adaptive_mcmc_tpu.metrics import (
    mmd_heuristic,
    pth_moment_rmse,
    wasserstein_dist11_p,
)

y = runs["nuts"].get_samples(flat_unconstrained=True)[:4000]
print("\nmetric table (vs NUTS draws):")
for name in ("arwmh", "asss"):
    x = runs[name].get_samples(flat_unconstrained=True)[:4000]
    print(
        f"  {name}: rmse={float(pth_moment_rmse(x, y, p=1.0)):.4f}  "
        f"W={wasserstein_dist11_p(x[:2000], y[:2000]):.4f}  "
        f"mmd={float(mmd_heuristic(x, y)):.4f}"
    )

# --- transition-kernel contraction diagnostics -----------------------------
from adaptive_mcmc_tpu.contraction import (
    compute_wasserstein_contraction,
    make_sample_px,
)

k = amt.arwmh(amt.std_normal(1))
adapt = amt.get_init_adapt_state(k, jax.random.PRNGKey(1),
                                 position=jnp.zeros(1))
tau, _, _ = compute_wasserstein_contraction(
    make_sample_px(k, adapt, n=8),
    jax.random.PRNGKey(2),
    jnp.linspace(-2, 2, 16)[:, None],
    sample_batch_size=512, n_train_batches=2, n_eval_batches=16,
    max_steps=40,
)
print(f"\nLipschitz-NN contraction estimate tau(P^8) on N(0,1): {float(tau):.3f}")
