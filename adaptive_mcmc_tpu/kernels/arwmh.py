"""ARWMH — Adaptive Random-Walk Metropolis-Hastings.

TPU-native rebuild of the reference kernel (arwmh.py:140-207): running-mean /
rank-1-Cholesky covariance adaptation (Haario-style AM in factored form) with
Robbins-Monro step-size tuning toward a 0.234 target acceptance rate.

Semantics preserved exactly (verified in tests/test_arwmh.py):
  * proposal  x' = x + (L e^λ + ε I) @ N(0, I_d)          (arwmh.py:164-167)
  * NaN potential -> +inf                                 (arwmh.py:171)
  * MH accept α = min(1, exp(U - U'))                     (arwmh.py:173)
  * adaptation clock n resets at the warmup boundary      (arwmh.py:181)
  * γ = n^(-lr_decay); μ' = μ + γδ;
    L' = chol((1-γ) L Lᵀ + γ δδᵀ) with NaN-guard fallback (arwmh.py:188-191)
  * log λ' = log λ + γ(α − α*)                            (arwmh.py:193)
  * as_change = ‖L' e^{λ'} − L e^{λ}‖_F                   (arwmh.py:197)

TPU-first differences: the state is a flat (chains, d) array batch (no
pytree ravel in the hot loop); the proposal draw is one batched matvec
(einsum -> MXU for wide chain batches); the rank-1 Cholesky update runs
either as a d-step scan of (chains, d) VPU ops or as a Pallas kernel with
chains on lanes (ops/pallas/chol_update.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from adaptive_mcmc_tpu.kernels.base import (
    Kernel,
    adaptation_lr,
    batch_positions,
    nan_to_inf,
    split_keys,
)
from adaptive_mcmc_tpu.ops.cholesky import adaptive_scale_update

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ARWMHConfig:
    lr_decay: float = 2.0 / 3.0
    target_accept_prob: float = 0.234
    eps: float = 1e-6
    num_warmup: int = 0
    adapt: bool = True          # False freezes loc/scale/step-size (plain RWM
                                # with a fixed Cholesky proposal)
    # Fused whole-step Pallas driver (ops/pallas/arwmh_fused.py): the whole
    # transition loop runs in ONE kernel with the state resident in VMEM.
    # None = opt-in via AMT_ARWMH_FUSED=1 on TPU (first-hardware A/B
    # showed the jitted-fori XLA driver ties it at small chain counts
    # and beats it at 4096 — see the gate note in arwmh()).  Its PRNG
    # streams differ from the lockstep step's jax.random streams —
    # statistically identical, not bitwise.
    fused: Optional[bool] = None


class ARWMHAdaptState(NamedTuple):
    loc: Array            # (C, d)   running mean μ̂
    scale: Array          # (C, d, d) Cholesky factor Σ̂^{1/2} (lower)
    log_step_size: Array  # (C,)     log λ


class ARWMHState(NamedTuple):
    i: Array                  # scalar iteration (lockstep across chains)
    position: Array           # (C, d) current point, unconstrained
    potential_energy: Array   # (C,)
    mean_accept_prob: Array   # (C,) running mean of acceptance probabilities
    adapt_state: ARWMHAdaptState
    as_change: Array          # (C,) ‖Δ(L e^λ)‖_F adaptation-drift diagnostic
    rng_key: Array            # (C,) per-chain keys


def arwmh(target, config: ARWMHConfig = ARWMHConfig()) -> Kernel:
    d = target.dim
    batched_potential = jax.vmap(target.potential_fn)
    eye = jnp.eye(d, dtype=jnp.float32)

    def init(
        rng_key: Array,
        n_chains: int = 1,
        position: Optional[Array] = None,
        adapt_state: Optional[ARWMHAdaptState] = None,
    ) -> ARWMHState:
        key_init, key_run = jax.random.split(rng_key)
        pos = batch_positions(target, key_init, n_chains, position)
        pe = nan_to_inf(batched_potential(pos))
        if adapt_state is None:
            adapt_state = ARWMHAdaptState(
                loc=pos,
                scale=jnp.broadcast_to(eye, (n_chains, d, d)),
                log_step_size=jnp.zeros((n_chains,)),
            )
        return ARWMHState(
            i=jnp.zeros((), jnp.int32),
            position=pos,
            potential_energy=pe,
            mean_accept_prob=jnp.zeros((n_chains,)),
            adapt_state=adapt_state,
            as_change=jnp.zeros((n_chains,)),
            rng_key=jax.random.split(key_run, n_chains),
        )

    def step(state: ARWMHState) -> ARWMHState:
        loc, L, log_lam = state.adapt_state
        x, pe = state.position, state.potential_energy
        C = x.shape[0]

        keys, keys_prop, keys_acc = split_keys(state.rng_key, 3)
        noise = jax.vmap(lambda k: jax.random.normal(k, (d,)))(keys_prop)
        step_size = jnp.exp(log_lam)  # (C,)
        # (L e^λ + ε I) @ noise as one batched matvec; HIGHEST keeps the
        # small d×d products in full fp32 on the MXU.
        prop_scale = L * step_size[:, None, None] + config.eps * eye
        x_prop = x + jnp.einsum(
            "cij,cj->ci", prop_scale, noise, precision=lax.Precision.HIGHEST
        )

        pe_prop = nan_to_inf(batched_potential(x_prop))
        accept_prob = jnp.minimum(jnp.exp(pe - pe_prop), 1.0)
        u = jax.vmap(jax.random.uniform)(keys_acc)
        accepted = u < accept_prob

        x_new = jnp.where(accepted[:, None], x_prop, x)
        pe_new = jnp.where(accepted, pe_prop, pe)

        n, gamma = adaptation_lr(state.i, config.num_warmup, config.lr_decay)
        nf = n.astype(jnp.float32)
        mean_ap = state.mean_accept_prob
        mean_ap_new = mean_ap + (accept_prob - mean_ap) / nf

        if config.adapt:
            delta = x_new - loc
            loc_new = loc + gamma * delta
            gammas = jnp.full((C,), gamma, jnp.float32)
            L_new = adaptive_scale_update(L, delta, gammas)
            log_lam_new = log_lam + gamma * (
                accept_prob - config.target_accept_prob
            )
            as_change = jnp.linalg.norm(
                L_new * jnp.exp(log_lam_new)[:, None, None]
                - L * step_size[:, None, None],
                axis=(-2, -1),
            )
            adapt_new = ARWMHAdaptState(loc_new, L_new, log_lam_new)
        else:
            adapt_new = state.adapt_state
            as_change = jnp.zeros((C,))

        return ARWMHState(
            i=state.i + 1,
            position=x_new,
            potential_energy=pe_new,
            mean_accept_prob=mean_ap_new,
            adapt_state=adapt_new,
            as_change=as_change,
            rng_key=keys,
        )

    # ---- fused whole-step Pallas driver (step_n / collect_n) -----------
    # First-hardware A/B (2026-08-18, eight-schools d=10, back-to-back
    # same-process runs): the fused kernel TIES the jitted-fori XLA
    # lockstep driver at 100 chains (0.99x) and LOSES at 4096 (0.78x) —
    # inside one jit region the XLA driver has no per-step dispatch
    # either, and its (C,d,d) rank-1 update tiles better than the
    # chains-last Mosaic build.  Opt-in (AMT_ARWMH_FUSED=1 or
    # config.fused=True) until a build beats the XLA path.
    use_fused = config.fused
    if use_fused is None:
        import os

        use_fused = (
            jax.default_backend() == "tpu"
            and config.adapt
            and d <= 16  # keep large-d targets (diamonds) on the XLA path
            and os.environ.get("AMT_ARWMH_FUSED") == "1"  # opt-in
        )
    step_n = collect_n = None
    if use_fused:
        from adaptive_mcmc_tpu.ops.pallas.arwmh_fused import (
            build_fused_arwmh,
        )

        drive = build_fused_arwmh(target, config)

        def _seed_of(state: ARWMHState) -> Array:
            """Distinct core-PRNG stream per (init key, call position)."""
            kd = state.rng_key
            if jax.dtypes.issubdtype(kd.dtype, jax.dtypes.prng_key):
                kd = jax.random.key_data(kd)
            return kd.reshape(-1)[0].astype(jnp.int32) ^ state.i

        def _as_tuple(state: ARWMHState):
            a = state.adapt_state
            return (state.position, state.potential_energy,
                    state.mean_accept_prob, a.loc, a.scale,
                    a.log_step_size, state.i)

        def _from_tuple(new, rng_key) -> ARWMHState:
            return ARWMHState(
                i=new[6],
                position=new[0],
                potential_energy=new[1],
                mean_accept_prob=new[2],
                adapt_state=ARWMHAdaptState(new[3], new[4], new[5]),
                as_change=new[7],
                rng_key=rng_key,
            )

        def step_n(state: ARWMHState, n_steps: int) -> ARWMHState:
            new, _ = drive(
                _as_tuple(state), n_steps, 0, 1, seed=_seed_of(state)
            )
            return _from_tuple(new, state.rng_key)

        def collect_n(state: ARWMHState, n_frames: int, thinning: int = 1):
            new, frames = drive(
                _as_tuple(state), n_frames * thinning, n_frames, thinning,
                seed=_seed_of(state),
            )
            return _from_tuple(new, state.rng_key), frames

        step_n = jax.jit(step_n, static_argnames=("n_steps",))
        collect_n = jax.jit(
            collect_n, static_argnames=("n_frames", "thinning")
        )

    return Kernel(
        name="arwmh",
        target=target,
        config=config,
        # jit at the factory boundary: eager step() calls compile once per
        # chain-count instead of dispatching ~50 primitives; inside
        # scan/jit the wrapper is inlined at trace time.
        init=jax.jit(init, static_argnames=("n_chains",)),
        step=jax.jit(step),
        step_n=step_n,
        collect_n=collect_n,
        collect_fields=(
            ("position", "potential_energy", "as_change")
            if use_fused else ()
        ),
    )


def rwm(target, scale: Optional[Array] = None, step_size: float = 1.0,
        eps: float = 1e-6) -> Kernel:
    """Fixed-proposal random-walk Metropolis: ARWMH with adaptation frozen
    (BASELINE.json config 1 — 'single-chain random-walk Metropolis, fixed
    proposal').  ``scale`` is the fixed Cholesky proposal factor (default I).
    """
    cfg = ARWMHConfig(adapt=False, eps=eps)
    k = arwmh(target, cfg)
    d = target.dim

    def init(rng_key, n_chains=1, position=None, adapt_state=None):
        st = k.init(rng_key, n_chains, position)
        L = jnp.eye(d) if scale is None else jnp.asarray(scale, jnp.float32)
        L = jnp.broadcast_to(L, (n_chains, d, d))
        adapt = ARWMHAdaptState(
            loc=st.adapt_state.loc,
            scale=L,
            log_step_size=jnp.full((n_chains,), jnp.log(step_size)),
        ) if adapt_state is None else adapt_state
        return st._replace(adapt_state=adapt)

    return dataclasses.replace(k, name="rwm", init=init)
