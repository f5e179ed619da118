"""A/B: does the warmup-boundary adaptation-clock reset cause the
early-sampling seed-mean variance excess in eight-schools ASSS?

A = reference semantics (clock resets at boundary; current code)
B = no reset (n continues across the boundary)

Runs 100 chains x (25k warmup + 250k sampling, thin 25) on CPU,
reports per-quarter seed-mean stds of mu and the rmse spread.
"""
import os, sys, time
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
sys.path.insert(0, '/root/repo')
import jax.numpy as jnp
import numpy as np

import adaptive_mcmc_tpu.kernels.base as base

variant = sys.argv[1] if len(sys.argv) > 1 else 'A'
if variant == 'B':
    _orig = base.adaptation_lr
    def no_reset_lr(i, num_warmup, lr_decay):
        itr = i + 1
        nf = itr.astype(jnp.float32) if hasattr(itr, 'astype') else float(itr)
        gamma = nf ** (-lr_decay) if lr_decay != 1.0 else 1.0 / nf
        return itr, gamma
    base.adaptation_lr = no_reset_lr
    # kernels import adaptation_lr by name at module import; patch there too
import importlib
asss_mod = importlib.import_module('adaptive_mcmc_tpu.kernels.asss')
if variant == 'B':
    asss_mod.adaptation_lr = base.adaptation_lr

from adaptive_mcmc_tpu import models
from adaptive_mcmc_tpu.infer.mcmc import run_mcmc

tgt = models.eight_schools_noncentered()
k = asss_mod.asss(tgt, asss_mod.ASSSConfig(num_warmup=25000))
t0 = time.time()
samples, _, _ = run_mcmc(
    k, jax.random.key(0), num_warmup=25000, num_samples=250000,
    thinning=25, n_chains=100,
)
samples = np.asarray(samples)  # (10000, 100, 10)
print(f'variant {variant}: wall {time.time()-t0:.0f}s shape {samples.shape}')
x = samples[:, :, 0].T  # (100 seeds, 10000 draws) mu
for q in range(4):
    qm = x[:, q*2500:(q+1)*2500].mean(1)
    print(f'  q{q}: seed-mean std {qm.std():.4f} (indep 0.0664)')
print(f'  full: seed-mean std {x.mean(1).std():.4f} (indep 0.0332)')
gold = np.load('/root/repo/mcmc_runs/reference_draws/eight_schools_nuts.npy')
gm = gold.mean(0)
err = samples.mean(0).T  # wait: samples (draws, chains, dim) -> per-chain mean
m = samples.mean(0)      # (100, 10)
rmse = np.linalg.norm(m - gm[None, :], axis=1)
print(f'  rmse vs gold: {rmse.mean():.4f} +- {rmse.std():.4f}')
