"""SA bound analysis (VERDICT r4 weak #5 / next-step #5).

Times the full SA step at the production shape (eight-schools, 1024
chains, N=102 ensemble) and, separately, surrogate programs for each
component the step is built from, at the exact batch shapes the step
uses:

  * replace-stats: the 3-chained rank-1 Cholesky updates on a
    (C*N, d, d) batch  (kernels/sa.py:_replace_stats)
  * mvn logpdf: batched triangular solve on (C*N, d, d)x(C*N, d)
  * refit guard: per-chain (N, d)'(N, d) matmul + batched
    jnp.linalg.cholesky(d) — computed unconditionally every step
    because lax.cond lowers to select under vmap (kernels/sa.py:161-164)

This identifies whether the 102-point leave-one-out math batches onto
the VPU/MXU or serializes, i.e. where the 212 s SA w_eval cell goes.

Run: python scripts/sa_bound.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")

C, N, d = 1024, 102, 10


def bench(f, *args, reps=5, inner=None):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from adaptive_mcmc_tpu import models
    from adaptive_mcmc_tpu.kernels.sa import SAConfig, sa
    from adaptive_mcmc_tpu.ops.cholesky import rank1_cholesky_update

    t = models.eight_schools_noncentered()
    k = sa(t, SAConfig())
    state = k.init(jax.random.PRNGKey(0), n_chains=C)

    # full step, amortized over a fori block (cancels dispatch)
    n_steps = 50
    loop = jax.jit(lambda s: jax.lax.fori_loop(
        0, n_steps, lambda _, x: k.step(x), s))
    state = loop(state)  # compile + adapt
    jax.block_until_ready(state.position)
    t_blk = bench(loop, state, reps=3)
    t_step = t_blk / n_steps
    print(f"full step: {t_step*1e6:.0f} us "
          f"({C/t_step/1e3:.1f}k chain-iters/s)", flush=True)

    key = jax.random.PRNGKey(1)
    B = C * N
    L = jnp.broadcast_to(jnp.eye(d), (B, d, d)) + 0.0
    v1 = jax.random.normal(key, (B, d))
    v2 = jax.random.normal(key, (B, d)) * 0.5
    v3 = v1 * (1.0 / N)

    # each surrogate runs K times inside one jit region (dependent carry)
    # so the ~25 ms per-dispatch tunnel latency is amortized, matching
    # the fori-amortized full-step measurement.
    K = 50

    def amortized(body, init):
        f = jax.jit(lambda s: jax.lax.fori_loop(0, K, body, init))
        return bench(f, init) / K

    up = jax.vmap(rank1_cholesky_update, in_axes=(0, 0, None))

    def rs_body(_, s):
        s = up(s, v1, 1.0 / N)
        s = up(s, v2, -1.0 / N)
        s = up(s, v3, -1.0)
        # renormalize so the factor can't drift to NaN over K trips
        return 0.999 * s + 0.001 * L

    t_rs = amortized(rs_body, L)
    print(f"replace-stats (3x rank-1, batch {B}): {t_rs*1e6:.0f} us",
          flush=True)

    def lp_body(_, carry):
        y = jax.vmap(
            lambda Li, xi: jax.scipy.linalg.solve_triangular(
                Li, xi, lower=True))(L, carry)
        lp = (-0.5 * jnp.sum(y * y, -1)
              - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1))
        return carry + 1e-9 * lp[:, None]

    t_lp = amortized(lp_body, v1)
    print(f"mvn logpdf (batched tri-solve, batch {B}): {t_lp*1e6:.0f} us",
          flush=True)

    zs = jax.random.normal(key, (C, N, d))

    def rf_body(_, zs):
        loc = jnp.mean(zs, axis=1)
        cen = zs - loc[:, None, :]
        cov = jnp.einsum("cnd,cne->cde", cen, cen) / N + 1e-6 * jnp.eye(d)
        chol = jnp.linalg.cholesky(cov)
        return zs + 1e-9 * chol[:, :N % 100 + 1, :].mean(1, keepdims=True)

    t_rf = amortized(rf_body, zs)
    print(f"refit guard (matmul+chol, batch {C}): {t_rf*1e6:.0f} us",
          flush=True)

    acc = t_rs + t_lp + t_rf
    print(f"components sum: {acc*1e6:.0f} us of {t_step*1e6:.0f} us "
          f"({100*acc/t_step:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
