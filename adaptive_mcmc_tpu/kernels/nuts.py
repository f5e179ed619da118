"""NUTS — No-U-Turn Sampler, self-contained and chain-batched.

The reference delegates NUTS to NumPyro (numpyro_kernels.py:76-141) with
defaults step_size=1.0, adapt_step_size=True, adapt_mass_matrix=True,
dense_mass=False, target_accept_prob=0.8, max_tree_depth=10.  NumPyro is
not a dependency of this framework, so NUTS is built from scratch here:

* leapfrog integration with diagonal or dense mass matrix;
* multinomial (progressive) sampling over the trajectory with biased
  subtree acceptance — the modern Stan-style scheme;
* ITERATIVE tree building inside ``lax.while_loop``s: the within-subtree
  no-U-turn condition is checked with a checkpoint stack of depth
  ``max_tree_depth`` (one balanced-subtree check per closing subtree —
  derivation in ``_build_subtree``), so the whole transition is one XLA
  program with static shapes;
* warmup adaptation: dual-averaging step size (Hoffman & Gelman), Welford
  covariance with Stan's init/window/term schedule (75/25-doubling/50),
  step-size re-search at window boundaries;
* divergence detection at max_delta_energy=1000 (NumPyro's default).

Chain batching: the per-chain transition is written single-chain and
``vmap``-ed — ``vmap`` of ``while_loop`` runs all chains in lockstep with
masked updates, so heterogeneous tree depths across chains cost
max-tree-time per batch row block, dense on the VPU (same trade NumPyro's
vectorized NUTS makes, but here it also shards over the chain mesh axis).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from adaptive_mcmc_tpu.kernels.base import (
    Kernel,
    batch_positions,
    nan_to_inf,
    recorder_drift_ok,
    recorder_flush_cl,
    recorder_init_cl,
    recorder_write_cl,
    split_keys,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NUTSConfig:
    step_size: float = 1.0
    adapt_step_size: bool = True
    adapt_mass_matrix: bool = True
    dense_mass: bool = False
    target_accept_prob: float = 0.8
    max_tree_depth: int = 10
    num_warmup: int = 0
    max_delta_energy: float = 1000.0
    # leapfrogs per while-loop trip in the subtree builder (trip-overhead
    # amortization for lockstep vmapped trees; finished lanes mask to no-ops)
    unroll_leaves: int = 4
    # expose the pipelined multi-step driver (step_n): one batched leapfrog
    # per while-iteration with per-chain tree bookkeeping, so heterogeneous
    # tree sizes across chains pipeline instead of running in lockstep
    pipeline: bool = True
    # leapfrogs per while trip inside step_n (masked no-ops on chains whose
    # machine is between phases; amortizes the ~5-10 us trip overhead)
    pipeline_unroll: int = 2


class DAState(NamedTuple):
    """Dual-averaging step-size adaptation (per chain)."""

    t: Array
    log_eps: Array
    log_eps_avg: Array
    h_bar: Array
    mu: Array


class WelfordState(NamedTuple):
    count: Array   # scalar per chain
    mean: Array    # (d,)
    m2: Array      # (d,) diag or (d, d) dense


class NUTSAdaptState(NamedTuple):
    da: DAState
    inv_mass: Array        # (d,) diag or (d, d) dense (M^-1)
    chol_inv_mass: Array   # (d,) sqrt-diag or (d, d) lower chol of M^-1
    welford: WelfordState


class NUTSState(NamedTuple):
    i: Array
    position: Array          # (C, d)
    potential_energy: Array  # (C,)
    pe_grad: Array           # (C, d) cached gradient
    mean_accept_prob: Array  # (C,)
    num_steps: Array         # (C,) leapfrog steps in last transition
    diverging: Array         # (C,) bool
    adapt_state: NUTSAdaptState
    rng_key: Array


# ---------------------------------------------------------------------------
# Mass-matrix algebra (diag & dense share one code path via ndim dispatch).
# ---------------------------------------------------------------------------

def _velocity(inv_mass, r):
    """v = M^-1 r."""
    if inv_mass.ndim == 1:
        return inv_mass * r
    return inv_mass @ r


def _kinetic(inv_mass, r):
    return 0.5 * jnp.dot(r, _velocity(inv_mass, r))


def _sample_momentum(key, chol_inv_mass, d):
    """r ~ N(0, M).  With C = chol(M^-1) (lower), M = C^-T C^-1, so
    r = C^-T eps has the right covariance."""
    eps = jax.random.normal(key, (d,))
    if chol_inv_mass.ndim == 1:
        return eps / chol_inv_mass
    return jax.scipy.linalg.solve_triangular(
        chol_inv_mass.T, eps, lower=False
    )


def _is_turning(inv_mass, r_first, r_last, rho):
    v_first = _velocity(inv_mass, r_first)
    v_last = _velocity(inv_mass, r_last)
    return (jnp.dot(v_first, rho) <= 0.0) | (jnp.dot(v_last, rho) <= 0.0)


def _velocity_rows(inv_mass, R):
    """v_i = M^-1 r_i for a stack of momenta R (k, d)."""
    if inv_mass.ndim == 1:
        return inv_mass[None, :] * R
    return R @ inv_mass  # M^-1 is symmetric


# ---------------------------------------------------------------------------
# Warmup schedule (Stan's 75 / 25-doubling / 50 windows) as constant masks.
# ---------------------------------------------------------------------------

def build_warmup_schedule(num_warmup: int):
    """Returns bool arrays (len num_warmup, possibly empty): whether the
    Welford accumulator consumes iteration i, and whether a mass-matrix
    window closes at i."""
    in_window = np.zeros(max(num_warmup, 1), bool)
    window_end = np.zeros(max(num_warmup, 1), bool)
    if num_warmup >= 20:
        init, term, base = 75, 50, 25
        if init + base + term > num_warmup:
            init = int(0.15 * num_warmup)
            term = int(0.10 * num_warmup)
            base = num_warmup - init - term
        start, w = init, base
        while start < num_warmup - term:
            end = min(start + w, num_warmup - term)
            if num_warmup - term - end < w * 2:
                end = num_warmup - term  # absorb the remainder
            in_window[start:end] = True
            window_end[end - 1] = True
            start, w = end, w * 2
    return jnp.asarray(in_window), jnp.asarray(window_end)


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def nuts(target, config: NUTSConfig = NUTSConfig()) -> Kernel:
    d = target.dim
    potential_vg = jax.value_and_grad(target.potential_fn)
    max_depth = config.max_tree_depth
    max_delta = config.max_delta_energy
    UNROLL_LEAVES = max(1, config.unroll_leaves)
    in_window_mask, window_end_mask = build_warmup_schedule(config.num_warmup)

    # Checkpoint bookkeeping lookup tables over leaf indices (subtrees hold
    # at most 2^(max_depth-1) leaves).  Gathers from these shared constants
    # vmap to one cheap (chains,) gather — unlike per-chain bit-trick op
    # chains or per-chain `.at[i]` scatters, which XLA lowers to slow
    # scatter/gather at large chain counts.
    _n_tab = 1 << max_depth
    slot_table = jnp.asarray(
        [bin(i >> 1).count("1") for i in range(_n_tab)], jnp.int32
    )
    trail_table = jnp.asarray(
        [(i ^ (i + 1)).bit_length() - 1 for i in range(_n_tab)], jnp.int32
    )

    def _leapfrog(z, r, grad, eps, inv_mass):
        r = r - 0.5 * eps * grad
        z = z + eps * _velocity(inv_mass, r)
        pe, grad = potential_vg(z)
        pe = nan_to_inf(pe)
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        r = r - 0.5 * eps * grad
        return z, r, pe, grad

    # -- subtree construction (iterative, single chain) --------------------
    class _Sub(NamedTuple):
        key: Array
        n: Array            # leaves built so far
        z: Array            # integration edge
        r: Array
        grad: Array
        pe: Array
        z_prop: Array
        pe_prop: Array
        grad_prop: Array
        log_w: Array        # logsumexp of -energy over subtree leaves
        r_sum: Array
        r_ckpt: Array       # (max_depth, d) first-leaf momenta of open subtrees
        s_ckpt: Array       # (max_depth, d) cumulative r_sum BEFORE each open subtree
        turning: Array
        diverging: Array
        accept_sum: Array

    def _build_subtree(key, z, r, grad, pe, eps_signed, inv_mass,
                       num_leaves, energy0):
        """Integrate ``num_leaves`` leapfrog steps from edge (z, r), with
        progressive multinomial proposal selection and incremental
        balanced-subtree U-turn checks.

        U-turn bookkeeping (NumPyro's iterative checkpoint scheme,
        hmc_util.py `_leaf_idx_to_ckpt_idxs`): leaves arrive with indices
        n = 0..N-1.  A balanced subtree of size 2^k ends at leaf n iff
        2^k divides n+1; its first leaf is n+1-2^k, which is even.  Each
        even leaf n stores (its momentum, cumulative momentum sum BEFORE
        it) at checkpoint slot popcount(n >> 1); an odd leaf n with t
        trailing ones in binary(n) closes t subtrees whose first-leaf
        checkpoints sit at slots popcount(n >> 1) down to
        popcount(n >> 1) - t + 1.  Slot reuse is safe: a slot is only
        overwritten after every subtree needing its old entry has closed.
        """

        def cond(s: _Sub):
            return (s.n < num_leaves) & ~s.turning & ~s.diverging

        def body(s: _Sub):
            # Masked no-op when the subtree is already done: `body` is
            # unrolled UNROLL_LEAVES times per while trip to amortize the
            # ~5-10 us TPU while-loop trip overhead over several leapfrogs
            # (vmapped trees run in chain lockstep, so trip count per draw
            # is the max tree size across the batch — trips dominate wall
            # at small state dims).  Lanes that finish mid-trip must not
            # advance state or consume RNG.
            active = (s.n < num_leaves) & ~s.turning & ~s.diverging
            z, r, pe, grad = _leapfrog(s.z, s.r, s.grad, eps_signed, inv_mass)
            energy = pe + _kinetic(inv_mass, r)
            energy = jnp.where(jnp.isnan(energy), jnp.inf, energy)
            delta = energy - energy0
            diverging = delta > max_delta
            log_w_leaf = -energy
            log_w_new = jnp.logaddexp(s.log_w, log_w_leaf)
            # progressive multinomial: take the new leaf as proposal with
            # probability exp(log_w_leaf - log_w_new)
            key, k_acc = jax.random.split(s.key)
            take = jax.random.uniform(k_acc) < jnp.exp(log_w_leaf - log_w_new)
            z_prop = jnp.where(take, z, s.z_prop)
            pe_prop = jnp.where(take, pe, s.pe_prop)
            grad_prop = jnp.where(take, grad, s.grad_prop)
            accept_sum = s.accept_sum + jnp.minimum(1.0, jnp.exp(-delta))

            n = s.n
            r_sum_new = s.r_sum + r
            is_even = (n % 2) == 0
            slot = slot_table[n]          # popcount(n >> 1)
            t = trail_table[n]            # trailing ones of n
            # push checkpoint on even leaves at `slot` (one-hot select, not
            # a scatter: vmaps to dense elementwise work)
            onehot = (jnp.arange(max_depth) == slot)[:, None] & is_even
            r_ckpt = jnp.where(onehot, r[None, :], s.r_ckpt)
            s_ckpt = jnp.where(onehot, s.r_sum[None, :], s.s_ckpt)
            # close subtrees on odd leaves: their first-leaf checkpoints sit
            # at slots (slot - t, slot].  Check ALL slots densely in one
            # shot and mask — no sequential loop, no per-chain gathers.
            rho_all = r_sum_new[None, :] - s_ckpt                 # (D, d)
            v_first = _velocity_rows(inv_mass, r_ckpt)            # (D, d)
            v_last = _velocity(inv_mass, r)                       # (d,)
            turn_all = (jnp.sum(v_first * rho_all, axis=-1) <= 0.0) | (
                rho_all @ v_last <= 0.0
            )
            j = jnp.arange(max_depth)
            sel = (~is_even) & (j <= slot) & (j > slot - t)
            turning = s.turning | jnp.any(turn_all & sel)

            stepped = _Sub(
                key=key, n=n + 1, z=z, r=r, grad=grad, pe=pe,
                z_prop=z_prop, pe_prop=pe_prop, grad_prop=grad_prop,
                log_w=log_w_new, r_sum=r_sum_new,
                r_ckpt=r_ckpt, s_ckpt=s_ckpt,
                turning=turning, diverging=s.diverging | diverging,
                accept_sum=accept_sum,
            )
            return jax.tree.map(
                lambda new, old: jnp.where(active, new, old), stepped, s
            )

        def body_unrolled(s: _Sub):
            for _ in range(UNROLL_LEAVES):
                s = body(s)
            return s

        init = _Sub(
            key=key,
            n=jnp.int32(0), z=z, r=r, grad=grad, pe=pe,
            z_prop=z, pe_prop=pe, grad_prop=grad,
            log_w=-jnp.inf, r_sum=jnp.zeros((d,)),
            r_ckpt=jnp.zeros((max_depth, d)),
            s_ckpt=jnp.zeros((max_depth, d)),
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            accept_sum=jnp.asarray(0.0),
        )
        return lax.while_loop(cond, body_unrolled, init)

    # -- one NUTS transition (single chain) --------------------------------
    class _Tree(NamedTuple):
        key: Array
        z_left: Array
        r_left: Array
        grad_left: Array
        z_right: Array
        r_right: Array
        grad_right: Array
        z_prop: Array
        pe_prop: Array
        grad_prop: Array
        log_w: Array
        r_sum: Array
        depth: Array
        turning: Array
        diverging: Array
        accept_sum: Array
        num_steps: Array

    def _single_transition(key, z, pe, grad, eps, inv_mass, chol_inv_mass):
        key, k_mom = jax.random.split(key)
        r0 = _sample_momentum(k_mom, chol_inv_mass, d)
        energy0 = pe + _kinetic(inv_mass, r0)

        def cond(tr: _Tree):
            return (tr.depth < max_depth) & ~tr.turning & ~tr.diverging

        def body(tr: _Tree):
            key, k_dir, k_sub, k_bias = jax.random.split(tr.key, 4)
            going_right = jax.random.bernoulli(k_dir)
            z_edge = jnp.where(going_right, tr.z_right, tr.z_left)
            r_edge = jnp.where(going_right, tr.r_right, tr.r_left)
            g_edge = jnp.where(going_right, tr.grad_right, tr.grad_left)
            pe_edge = jnp.zeros(())  # recomputed by first leapfrog
            eps_signed = jnp.where(going_right, eps, -eps)
            num_leaves = jnp.int32(1) << tr.depth

            sub = _build_subtree(
                k_sub, z_edge, r_edge, g_edge, pe_edge,
                eps_signed, inv_mass, num_leaves, energy0,
            )
            invalid = sub.turning | sub.diverging
            # biased progressive acceptance of the subtree proposal
            accept_p = jnp.exp(jnp.minimum(0.0, sub.log_w - tr.log_w))
            take = (jax.random.uniform(k_bias) < accept_p) & ~invalid
            z_prop = jnp.where(take, sub.z_prop, tr.z_prop)
            pe_prop = jnp.where(take, sub.pe_prop, tr.pe_prop)
            grad_prop = jnp.where(take, sub.grad_prop, tr.grad_prop)

            # merge (only meaningful when the subtree is valid)
            z_left = jnp.where(going_right, tr.z_left, sub.z)
            r_left = jnp.where(going_right, tr.r_left, sub.r)
            grad_left = jnp.where(going_right, tr.grad_left, sub.grad)
            z_right = jnp.where(going_right, sub.z, tr.z_right)
            r_right = jnp.where(going_right, sub.r, tr.r_right)
            grad_right = jnp.where(going_right, sub.grad, tr.grad_right)
            r_sum = tr.r_sum + sub.r_sum
            log_w = jnp.logaddexp(tr.log_w, sub.log_w)
            turning_full = _is_turning(inv_mass, r_left, r_right, r_sum)

            return _Tree(
                key=key,
                z_left=z_left, r_left=r_left, grad_left=grad_left,
                z_right=z_right, r_right=r_right, grad_right=grad_right,
                z_prop=z_prop, pe_prop=pe_prop, grad_prop=grad_prop,
                log_w=log_w, r_sum=r_sum,
                depth=tr.depth + 1,
                turning=invalid | sub.turning | turning_full,
                diverging=sub.diverging,
                accept_sum=tr.accept_sum + sub.accept_sum,
                num_steps=tr.num_steps + sub.n,
            )

        init = _Tree(
            key=key,
            z_left=z, r_left=r0, grad_left=grad,
            z_right=z, r_right=r0, grad_right=grad,
            z_prop=z, pe_prop=pe, grad_prop=grad,
            log_w=-energy0, r_sum=r0,
            depth=jnp.int32(0),
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            accept_sum=jnp.asarray(0.0), num_steps=jnp.int32(0),
        )
        tr = lax.while_loop(cond, body, init)
        accept_prob = tr.accept_sum / jnp.maximum(
            tr.num_steps.astype(jnp.float32), 1.0
        )
        return (
            tr.z_prop, tr.pe_prop, tr.grad_prop, accept_prob,
            tr.num_steps, tr.diverging,
        )

    # -- step-size search (single chain) -----------------------------------
    def _find_reasonable_step_size(key, z, pe, grad, inv_mass,
                                   chol_inv_mass, eps0):
        r = _sample_momentum(key, chol_inv_mass, d)
        energy0 = pe + _kinetic(inv_mass, r)

        def accept_of(eps):
            z1, r1, pe1, _ = _leapfrog(z, r, grad, eps, inv_mass)
            e1 = pe1 + _kinetic(inv_mass, r1)
            return jnp.exp(energy0 - jnp.where(jnp.isnan(e1), jnp.inf, e1))

        direction = jnp.where(accept_of(eps0) > 0.5, 1.0, -1.0)

        def cond(val):
            eps, it = val
            a = accept_of(eps)
            keep = jnp.where(direction > 0, a > 0.5, a < 0.5)
            return keep & (it < 64) & (eps > 1e-8) & (eps < 1e7)

        def body(val):
            eps, it = val
            return eps * jnp.where(direction > 0, 2.0, 0.5), it + 1

        eps, _ = lax.while_loop(cond, body, (eps0, jnp.int32(0)))
        return eps

    # -- Welford + dual averaging ------------------------------------------
    def _welford_update(w: WelfordState, x):
        c = w.count + 1.0
        delta = x - w.mean
        mean = w.mean + delta / c
        if config.dense_mass:
            m2 = w.m2 + jnp.outer(delta, x - mean)
        else:
            m2 = w.m2 + delta * (x - mean)
        return WelfordState(c, mean, m2)

    def _welford_finalize(w: WelfordState):
        """Regularized covariance -> (inv_mass, chol_inv_mass)."""
        c = jnp.maximum(w.count, 2.0)
        cov = w.m2 / (c - 1.0)
        shrink = c / (c + 5.0)
        if config.dense_mass:
            cov = shrink * cov + 1e-3 * (1.0 - shrink) * jnp.eye(d)
            chol = jnp.linalg.cholesky(cov)
            ok = ~jnp.any(jnp.isnan(chol))
            cov = jnp.where(ok, cov, jnp.eye(d))
            chol = jnp.where(ok, chol, jnp.eye(d))
            return cov, chol
        cov = shrink * cov + 1e-3 * (1.0 - shrink)
        cov = jnp.where(cov > 0, cov, 1.0)
        return cov, jnp.sqrt(cov)

    def _fresh_welford(n_chains):
        shape = (n_chains, d, d) if config.dense_mass else (n_chains, d)
        return WelfordState(
            count=jnp.zeros((n_chains,)),
            mean=jnp.zeros((n_chains, d)),
            m2=jnp.zeros(shape),
        )

    def _da_init(log_eps, n_chains):
        return DAState(
            t=jnp.zeros((n_chains,)),
            log_eps=log_eps,
            log_eps_avg=jnp.zeros((n_chains,)),
            h_bar=jnp.zeros((n_chains,)),
            mu=jnp.log(10.0) + log_eps,
        )

    def _da_update(da: DAState, stat):
        t0, kappa, gamma = 10.0, 0.75, 0.05
        t = da.t + 1.0
        h_bar = (1.0 - 1.0 / (t + t0)) * da.h_bar + (
            config.target_accept_prob - stat
        ) / (t + t0)
        log_eps = da.mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_avg = w * log_eps + (1.0 - w) * da.log_eps_avg
        return DAState(t, log_eps, log_eps_avg, h_bar, da.mu)

    # -- public init / step -------------------------------------------------
    def init(
        rng_key: Array,
        n_chains: int = 1,
        position: Optional[Array] = None,
        adapt_state: Optional[NUTSAdaptState] = None,
    ) -> NUTSState:
        key_init, key_run, key_eps = jax.random.split(rng_key, 3)
        pos = batch_positions(target, key_init, n_chains, position)
        pe, grad = jax.vmap(potential_vg)(pos)
        pe = nan_to_inf(pe)
        if adapt_state is None:
            if config.dense_mass:
                inv_mass = jnp.broadcast_to(jnp.eye(d), (n_chains, d, d))
                chol = inv_mass
            else:
                inv_mass = jnp.ones((n_chains, d))
                chol = inv_mass
            if config.adapt_step_size:
                eps0 = jax.vmap(
                    _find_reasonable_step_size,
                    in_axes=(0, 0, 0, 0, 0, 0, None),
                )(
                    jax.random.split(key_eps, n_chains),
                    pos, pe, grad, inv_mass, chol,
                    jnp.asarray(config.step_size),
                )
            else:
                eps0 = jnp.full((n_chains,), config.step_size)
            adapt_state = NUTSAdaptState(
                da=_da_init(jnp.log(eps0), n_chains),
                inv_mass=inv_mass,
                chol_inv_mass=chol,
                welford=_fresh_welford(n_chains),
            )
        return NUTSState(
            i=jnp.zeros((), jnp.int32),
            position=pos,
            potential_energy=pe,
            pe_grad=grad,
            mean_accept_prob=jnp.zeros((n_chains,)),
            num_steps=jnp.zeros((n_chains,), jnp.int32),
            diverging=jnp.zeros((n_chains,), bool),
            adapt_state=adapt_state,
            rng_key=jax.random.split(key_run, n_chains),
        )

    def step(state: NUTSState) -> NUTSState:
        adapt = state.adapt_state
        C = state.position.shape[0]
        in_warmup = state.i < config.num_warmup

        if config.adapt_step_size:
            eps = jnp.exp(
                jnp.where(in_warmup, adapt.da.log_eps, adapt.da.log_eps_avg)
            )
        else:
            eps = jnp.exp(adapt.da.log_eps)

        keys, keys_tr = split_keys(state.rng_key, 2)
        z_new, pe_new, grad_new, accept_prob, num_steps, diverging = jax.vmap(
            _single_transition
        )(
            keys_tr, state.position, state.potential_energy, state.pe_grad,
            eps, adapt.inv_mass, adapt.chol_inv_mass,
        )

        itr = state.i + 1
        n = jnp.where(in_warmup, itr, itr - config.num_warmup).astype(
            jnp.float32
        )
        mean_ap = state.mean_accept_prob
        mean_ap = mean_ap + (accept_prob - mean_ap) / n

        # --- warmup adaptation (scalar-gated: the iteration counter is a
        # scalar, so lax.cond skips this entire block post-warmup and the
        # Welford finalize + DA restart run only at window boundaries) ----
        if config.num_warmup > 0 and (
            config.adapt_step_size or config.adapt_mass_matrix
        ):
            idx = jnp.minimum(state.i, in_window_mask.shape[0] - 1)
            in_win = in_window_mask[idx] & in_warmup
            win_end = window_end_mask[idx] & in_warmup

            def _adapted(operand):
                adapt, accept_prob, z_new = operand
                da = (
                    _da_update(adapt.da, accept_prob)
                    if config.adapt_step_size
                    else adapt.da
                )
                if config.adapt_mass_matrix:
                    wf = lax.cond(
                        in_win,
                        lambda w: jax.vmap(_welford_update)(w, z_new),
                        lambda w: w,
                        adapt.welford,
                    )

                    def _close_window(_):
                        inv_f, chol_f = jax.vmap(_welford_finalize)(wf)
                        da2 = (
                            _da_init(da.log_eps, C)
                            if config.adapt_step_size
                            else da
                        )
                        return inv_f, chol_f, _fresh_welford(C), da2

                    def _keep(_):
                        return adapt.inv_mass, adapt.chol_inv_mass, wf, da

                    inv_mass, chol, wf, da = lax.cond(
                        win_end, _close_window, _keep, None
                    )
                else:
                    inv_mass, chol, wf = (
                        adapt.inv_mass, adapt.chol_inv_mass, adapt.welford
                    )
                return NUTSAdaptState(
                    da=da, inv_mass=inv_mass, chol_inv_mass=chol, welford=wf
                )

            adapt = lax.cond(
                in_warmup,
                _adapted,
                lambda operand: operand[0],
                (adapt, accept_prob, z_new),
            )

        return NUTSState(
            i=itr,
            position=z_new,
            potential_energy=pe_new,
            pe_grad=grad_new,
            mean_accept_prob=mean_ap,
            num_steps=num_steps,
            diverging=diverging & ~in_warmup,
            adapt_state=adapt,
            rng_key=keys,
        )

    # -- pipelined multi-step driver ----------------------------------------
    # Chains-LAST batched helpers: the d (or (max_depth, d)) axes lead and
    # chains ride the 128-wide TPU lane axis.  A (C, d) layout puts d
    # minor, which pads 10 -> 128 lanes on TPU — every op on the
    # (C, max_depth, d) checkpoint stacks then moves ~13x its logical
    # bytes.  With chains last, every per-trip elementwise op is a dense
    # lane-wide tile; at ~10 leapfrogs per transition and ~200k pipelined
    # trips per eight-schools sweep this dominates the NUTS wall.

    def _pe_cl(X):
        """Batched potential, chains-last: (d, C) -> (C,)."""
        return jax.vmap(target.potential_fn, in_axes=1)(X)

    def _pot_vg_cl(X):
        """(pe, grad) of the summed potential — one vjp for the whole
        chain batch instead of a vmapped per-chain value_and_grad."""
        pe, vjp = jax.vjp(_pe_cl, X)
        return pe, vjp(jnp.ones_like(pe))[0]

    def _cvel(inv_mass, r):
        """v = M^-1 r; inv_mass (d, C) diag or (d, d, C) dense; r (d, C)."""
        if inv_mass.ndim == 2:
            return inv_mass * r
        return jnp.einsum("ijc,jc->ic", inv_mass, r)

    def _cvel_rows(inv_mass, R):
        """v_k = M^-1 r_k for checkpoint stacks R (max_depth, d, C)."""
        if inv_mass.ndim == 2:
            return inv_mass[None] * R
        return jnp.einsum("ijc,kjc->kic", inv_mass, R)

    def _ckin(inv_mass, r):
        return 0.5 * jnp.sum(r * _cvel(inv_mass, r), axis=0)

    def _cmom(n01, chol_inv_mass):
        """r ~ N(0, M) from standard normals n01 (d, C); chol_inv_mass is
        chol(M^-1): (d, C) sqrt-diag or (d, d, C) lower."""
        if chol_inv_mass.ndim == 2:
            return n01 / chol_inv_mass
        return jax.vmap(
            lambda L, e: jax.scipy.linalg.solve_triangular(
                L.T, e, lower=False
            ),
            in_axes=(2, 1), out_axes=1,
        )(chol_inv_mass, n01)

    def _cleapfrog(z, r, grad, eps_signed, inv_mass):
        e = eps_signed[None, :]
        r = r - 0.5 * e * grad
        z = z + e * _cvel(inv_mass, r)
        pe, g = _pot_vg_cl(z)
        pe = nan_to_inf(pe)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        r = r - 0.5 * e * g
        return z, r, pe, g

    def _cwelford_update(w: WelfordState, x):
        """x (d, C); w.mean/(diag m2) (d, C), dense m2 (d, d, C)."""
        c = w.count + 1.0
        delta = x - w.mean
        mean = w.mean + delta / c[None, :]
        if config.dense_mass:
            m2 = w.m2 + jnp.einsum("ic,jc->ijc", delta, x - mean)
        else:
            m2 = w.m2 + delta * (x - mean)
        return WelfordState(c, mean, m2)

    def _cwelford_finalize(w: WelfordState):
        """Chains-last twin of _welford_finalize."""
        c = jnp.maximum(w.count, 2.0)                      # (C,)
        shrink = c / (c + 5.0)
        if config.dense_mass:
            cov = w.m2 / (c - 1.0)[None, None, :]
            cov = shrink * cov + 1e-3 * (1.0 - shrink) * jnp.eye(d)[
                :, :, None
            ]
            chol = jax.vmap(jnp.linalg.cholesky, in_axes=2, out_axes=2)(cov)
            ok = ~jnp.any(jnp.isnan(chol), axis=(0, 1))    # (C,)
            eye = jnp.broadcast_to(jnp.eye(d)[:, :, None], cov.shape)
            cov = jnp.where(ok[None, None, :], cov, eye)
            chol = jnp.where(ok[None, None, :], chol, eye)
            return cov, chol
        cov = w.m2 / (c - 1.0)[None, :]
        cov = shrink[None, :] * cov + 1e-3 * (1.0 - shrink)[None, :]
        cov = jnp.where(cov > 0, cov, 1.0)
        return cov, jnp.sqrt(cov)

    def _cfresh_welford(C):
        if config.dense_mass:
            m2 = jnp.zeros((d, d, C))
        else:
            m2 = jnp.zeros((d, C))
        return WelfordState(jnp.zeros((C,)), jnp.zeros((d, C)), m2)

    def _sel(mask, new, old):
        """Per-chain select; mask (C,) broadcasts over LEADING dims
        (chains-last layouts)."""
        m = mask.reshape((1,) * (new.ndim - 1) + mask.shape)
        return jnp.where(m, new, old)

    def _sel_keys(mask, new, old):
        """Select for the (C, 2) / typed-(C,) key leaves (chains FIRST)."""
        m = mask.reshape(mask.shape + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    class _Pipe(NamedTuple):
        """Per-chain NUTS machine: chain state + open tree + open subtree.

        All d-vector leaves are chains-last (d, C); checkpoint stacks are
        (max_depth, d, C); scalars (C,).  ``keys`` alone stays chains-first
        ((C, 2) raw / (C,) typed) — it is consumed by vmapped splits."""

        keys: Array
        done: Array          # (C,) transitions completed this call
        x: Array             # (d, C) accepted position
        pe: Array
        grad: Array
        mean_ap: Array
        ns_last: Array       # num_steps of last finished transition
        div_last: Array
        da: DAState
        inv_mass: Array
        chol: Array
        wf: WelfordState
        eps: Array           # (C,) step size of the open transition
        energy0: Array
        # open tree
        tzl: Array
        trl: Array
        tgl: Array
        tzr: Array
        trr: Array
        tgr: Array
        tzp: Array
        tpep: Array
        tgp: Array
        tlw: Array
        trs: Array
        tdep: Array
        tacc: Array
        tns: Array
        # open subtree
        sgr: Array           # going_right of the open subtree
        sn: Array            # leaves built
        snl: Array           # leaves wanted (2^depth)
        sz: Array            # integration edge
        sr: Array
        sg: Array
        szp: Array
        spep: Array
        sgp: Array
        slw: Array
        srs: Array
        rck: Array           # (max_depth, d, C)
        sck: Array
        sturn: Array
        sdiv: Array
        sacc: Array
        esg: Array           # (C,) signed eps

    def _trans_eps(da: DAState, i_glob):
        """Step size for the transition at global iteration index i_glob."""
        if config.adapt_step_size:
            return jnp.exp(
                jnp.where(
                    i_glob < config.num_warmup, da.log_eps, da.log_eps_avg
                )
            )
        return jnp.exp(da.log_eps)

    _SQRT2 = 1.4142135623730951
    _U_LO = -0.99999994  # nextafter(-1, 0) in f32: keeps erfinv finite

    def _trip_draws(k_draw):
        """ALL per-trip randomness from ONE batched threefry invocation:
        (u_acc, u_bias, dir bernoulli, momentum normals (d, C)).  The old
        path spent 5 vmapped RNG invocations per trip (split + 2 uniforms
        + bernoulli + normal), each a full ~27-op threefry sequence —
        roughly half the per-trip op count for randomness alone."""
        U = jax.vmap(lambda k: jax.random.uniform(k, (3 + d,)))(k_draw)
        UT = U.T                                            # (3+d, C)
        n01 = _SQRT2 * jax.scipy.special.erfinv(
            jnp.maximum(2.0 * UT[3:] - 1.0, _U_LO)
        )
        return UT[0], UT[1], UT[2] < 0.5, n01

    def _fresh_tree(n01, gr, x, pe, grad, da, inv_mass, chol, i_glob):
        """Everything a chain needs to open transition i_glob from (x, pe,
        grad): momentum from the trip's normals, initial tree, first
        depth-0 subtree.  Chains-last."""
        C = x.shape[1]
        eps = _trans_eps(da, i_glob)
        r0 = _cmom(n01, chol)
        e0 = pe + _ckin(inv_mass, r0)
        zeros_ck = jnp.zeros((max_depth, d, C))
        return dict(
            eps=eps, energy0=e0,
            tzl=x, trl=r0, tgl=grad, tzr=x, trr=r0, tgr=grad,
            tzp=x, tpep=pe, tgp=grad, tlw=-e0, trs=r0,
            tdep=jnp.zeros((C,), jnp.int32),
            tacc=jnp.zeros((C,)), tns=jnp.zeros((C,), jnp.int32),
            sgr=gr, sn=jnp.zeros((C,), jnp.int32),
            snl=jnp.ones((C,), jnp.int32),
            sz=x, sr=r0, sg=grad, szp=x, spep=pe, sgp=grad,
            slw=jnp.full((C,), -jnp.inf), srs=jnp.zeros((d, C)),
            rck=zeros_ck, sck=zeros_ck,
            sturn=jnp.zeros((C,), bool), sdiv=jnp.zeros((C,), bool),
            sacc=jnp.zeros((C,)),
            esg=jnp.where(gr, eps, -eps),
        )

    def _drive(state: NUTSState, n_steps: int, n_frames: int, thinning: int):
        """Advance every chain by exactly ``n_steps`` NUTS transitions with
        tree building PIPELINED across chains.

        With ``n_frames > 0`` additionally records each chain's every
        ``thinning``-th completed position (and potential energy) into a
        preallocated ``(C, n_frames, ...)`` buffer AS that chain completes
        the transition — the pipelined-collect path (``collect_n``).  A
        scan-of-step_n collect loop syncs all chains at every frame
        boundary (each frame costs the max-over-chains tree work for
        ``thinning`` transitions); here the only barrier is the call
        boundary, so the straggler tail is paid once per call instead of
        once per frame.

        The lockstep ``step`` runs vmapped while-loops, so every doubling
        waits for the slowest chain's subtree and every transition costs
        max-over-chains tree size; during early warmup a single chain at
        max_tree_depth forces ~1000 lockstep leapfrogs on the whole batch.
        Here every while-iteration performs exactly ONE batched leapfrog
        (+ gradient) and each chain drives its own machine: momentum draw →
        direction draw → subtree leaves (progressive multinomial + the same
        checkpoint U-turn bookkeeping as ``_build_subtree``) → biased merge
        → finalize (dual-averaging / Welford windows, per-chain warmup
        clock i0 + done) → next momentum draw.  A chain that finishes its
        transition starts the next one immediately instead of idling until
        the slowest tree closes; the only sync point is this call's
        boundary.  Transition semantics are identical to ``step``; per-chain
        RNG streams differ only in draw structure (one batched uniform
        block per trip instead of per-use splits)."""
        C = state.position.shape[0]
        i0 = state.i
        adapt = state.adapt_state
        nwl = in_window_mask.shape[0]
        do_adapt = config.num_warmup > 0 and (
            config.adapt_step_size or config.adapt_mass_matrix
        )

        def _t_in(a):
            """Public chains-first array -> internal chains-last."""
            return jnp.moveaxis(a, 0, -1)

        inv_mass0 = _t_in(adapt.inv_mass)
        chol0 = _t_in(adapt.chol_inv_mass)
        wf0 = WelfordState(
            adapt.welford.count, _t_in(adapt.welford.mean),
            _t_in(adapt.welford.m2),
        )

        k_keys, k_draw0 = split_keys(state.rng_key, 2)
        _, _, gr0, n01_0 = _trip_draws(k_draw0)
        zero_i = jnp.zeros((C,), jnp.int32)
        fresh0 = _fresh_tree(
            n01_0, gr0, state.position.T, state.potential_energy,
            state.pe_grad.T, adapt.da, inv_mass0, chol0,
            jnp.full((C,), i0, jnp.int32),
        )
        p0 = _Pipe(
            keys=k_keys, done=zero_i,
            x=state.position.T, pe=state.potential_energy,
            grad=state.pe_grad.T,
            mean_ap=state.mean_accept_prob, ns_last=state.num_steps,
            div_last=state.diverging,
            da=adapt.da, inv_mass=inv_mass0, chol=chol0,
            wf=wf0, **fresh0,
        )

        def cond(p: _Pipe):
            return jnp.any(p.done < n_steps)

        def body(p: _Pipe) -> _Pipe:
            active = p.done < n_steps
            k_next, k_draw = split_keys(p.keys, 2)
            keys = _sel_keys(active, k_next, p.keys)
            u_acc, u_b, gr_draw, n01 = _trip_draws(k_draw)

            # — the one batched leapfrog of this iteration —
            z, r, pe_l, g = _cleapfrog(p.sz, p.sr, p.sg, p.esg, p.inv_mass)
            energy = pe_l + _ckin(p.inv_mass, r)
            energy = jnp.where(jnp.isnan(energy), jnp.inf, energy)
            delta = energy - p.energy0
            div_leaf = delta > max_delta
            lw_leaf = -energy
            slw = jnp.logaddexp(p.slw, lw_leaf)
            take = u_acc < jnp.exp(lw_leaf - slw)
            szp = _sel(take, z, p.szp)
            spep = _sel(take, pe_l, p.spep)
            sgp = _sel(take, g, p.sgp)
            sacc = p.sacc + jnp.minimum(1.0, jnp.exp(-delta))
            # checkpoint push (even leaves) / subtree closes (odd leaves) —
            # same dense one-hot scheme as _build_subtree, batched over C
            n = p.sn
            srs = p.srs + r
            is_even = (n % 2) == 0
            slot = slot_table[n]
            t = trail_table[n]
            jd = jnp.arange(max_depth)[:, None]                # (D, 1)
            onehot = ((jd == slot[None, :]) & is_even[None, :])[:, None, :]
            rck = jnp.where(onehot, r[None, :, :], p.rck)
            sck = jnp.where(onehot, p.srs[None, :, :], p.sck)
            rho_all = srs[None, :, :] - sck                    # (D, d, C)
            v_first = _cvel_rows(p.inv_mass, rck)
            v_last = _cvel(p.inv_mass, r)
            turn_all = (jnp.sum(v_first * rho_all, axis=1) <= 0.0) | (
                jnp.sum(rho_all * v_last[None, :, :], axis=1) <= 0.0
            )                                                  # (D, C)
            sel_slots = (
                (~is_even)[None, :]
                & (jd <= slot[None, :])
                & (jd > (slot - t)[None, :])
            )
            sturn = p.sturn | jnp.any(turn_all & sel_slots, axis=0)
            sdiv = p.sdiv | div_leaf
            sn = n + 1

            # — subtree close → biased merge into the tree —
            sub_done = active & ((sn >= p.snl) | sturn | sdiv)
            invalid = sturn | sdiv
            accept_p = jnp.exp(jnp.minimum(0.0, slw - p.tlw))
            take_t = sub_done & (u_b < accept_p) & ~invalid
            tzp = _sel(take_t, szp, p.tzp)
            tpep = _sel(take_t, spep, p.tpep)
            tgp = _sel(take_t, sgp, p.tgp)
            ml = sub_done & ~p.sgr
            mr = sub_done & p.sgr
            tzl = _sel(ml, z, p.tzl)
            trl = _sel(ml, r, p.trl)
            tgl = _sel(ml, g, p.tgl)
            tzr = _sel(mr, z, p.tzr)
            trr = _sel(mr, r, p.trr)
            tgr = _sel(mr, g, p.tgr)
            trs = _sel(sub_done, p.trs + srs, p.trs)
            tlw = _sel(sub_done, jnp.logaddexp(p.tlw, slw), p.tlw)
            vl = _cvel(p.inv_mass, trl)
            vr = _cvel(p.inv_mass, trr)
            turning_full = (jnp.sum(vl * trs, axis=0) <= 0.0) | (
                jnp.sum(vr * trs, axis=0) <= 0.0
            )
            tturn = jnp.where(sub_done, invalid | turning_full, False)
            tdiv = jnp.where(sub_done, sdiv, False)
            tdep = jnp.where(sub_done, p.tdep + 1, p.tdep)
            tacc = jnp.where(sub_done, p.tacc + sacc, p.tacc)
            tns = jnp.where(sub_done, p.tns + sn, p.tns)
            tree_done = sub_done & (tturn | tdiv | (tdep >= max_depth))
            tree_cont = sub_done & ~tree_done

            # — finalize completed transitions —
            i_glob = i0 + p.done
            in_warm = i_glob < config.num_warmup
            ap = tacc / jnp.maximum(tns.astype(jnp.float32), 1.0)
            x_new = _sel(tree_done, tzp, p.x)
            pe_new = _sel(tree_done, tpep, p.pe)
            grad_new = _sel(tree_done, tgp, p.grad)
            itr = i_glob + 1
            nf = jnp.where(in_warm, itr, itr - config.num_warmup).astype(
                jnp.float32
            )
            mean_ap = jnp.where(
                tree_done, p.mean_ap + (ap - p.mean_ap) / nf, p.mean_ap
            )
            ns_last = jnp.where(tree_done, tns, p.ns_last)
            div_last = jnp.where(tree_done, tdiv & ~in_warm, p.div_last)

            da, inv_mass, chol, wf = p.da, p.inv_mass, p.chol, p.wf
            if do_adapt:
                adapt_mask = tree_done & in_warm
                idx = jnp.minimum(i_glob, nwl - 1)
                in_win = in_window_mask[idx] & adapt_mask
                win_end = window_end_mask[idx] & adapt_mask
                if config.adapt_step_size:
                    da_cand = _da_update(da, ap)
                    da = jax.tree.map(
                        lambda new, old: _sel(adapt_mask, new, old),
                        da_cand, da,
                    )
                if config.adapt_mass_matrix:
                    wf_cand = _cwelford_update(wf, x_new)
                    wf = jax.tree.map(
                        lambda new, old: _sel(in_win, new, old), wf_cand, wf
                    )

                    def _close(args):
                        da, inv_mass, chol, wf = args
                        inv_f, chol_f = _cwelford_finalize(wf)
                        inv2 = _sel(win_end, inv_f, inv_mass)
                        chol2 = _sel(win_end, chol_f, chol)
                        wf2 = jax.tree.map(
                            lambda new, old: _sel(win_end, new, old),
                            _cfresh_welford(C), wf,
                        )
                        da2 = da
                        if config.adapt_step_size:
                            da2 = jax.tree.map(
                                lambda new, old: _sel(win_end, new, old),
                                _da_init(da.log_eps, C), da,
                            )
                        return da2, inv2, chol2, wf2

                    da, inv_mass, chol, wf = lax.cond(
                        jnp.any(win_end),
                        _close,
                        lambda args: args,
                        (da, inv_mass, chol, wf),
                    )

            done = p.done + tree_done.astype(jnp.int32)
            start_new = tree_done & (done < n_steps)

            # — continuing trees draw a direction and open the next
            #   subtree from the chosen edge —
            edge_z = _sel(gr_draw, tzr, tzl)
            edge_r = _sel(gr_draw, trr, trl)
            edge_g = _sel(gr_draw, tgr, tgl)

            # — finished chains (except those done with the call) open the
            #   next transition from the finalized state —
            fresh = _fresh_tree(
                n01, gr_draw, x_new, pe_new, grad_new, da, inv_mass, chol,
                i0 + done,
            )

            def pick3(new_v, cont_v, keep_v):
                return _sel(
                    start_new, new_v, _sel(tree_cont, cont_v, keep_v)
                )

            zero_f = jnp.zeros((C,))
            zero_ck = jnp.zeros((max_depth, d, C))
            neg_inf = jnp.full((C,), -jnp.inf)
            return _Pipe(
                keys=keys, done=done,
                x=x_new, pe=pe_new, grad=grad_new,
                mean_ap=mean_ap, ns_last=ns_last, div_last=div_last,
                da=da, inv_mass=inv_mass, chol=chol, wf=wf,
                eps=pick3(fresh["eps"], p.eps, p.eps),
                energy0=pick3(fresh["energy0"], p.energy0, p.energy0),
                tzl=pick3(fresh["tzl"], tzl, tzl),
                trl=pick3(fresh["trl"], trl, trl),
                tgl=pick3(fresh["tgl"], tgl, tgl),
                tzr=pick3(fresh["tzr"], tzr, tzr),
                trr=pick3(fresh["trr"], trr, trr),
                tgr=pick3(fresh["tgr"], tgr, tgr),
                tzp=pick3(fresh["tzp"], tzp, tzp),
                tpep=pick3(fresh["tpep"], tpep, tpep),
                tgp=pick3(fresh["tgp"], tgp, tgp),
                tlw=pick3(fresh["tlw"], tlw, tlw),
                trs=pick3(fresh["trs"], trs, trs),
                tdep=pick3(fresh["tdep"], tdep, tdep),
                tacc=pick3(fresh["tacc"], tacc, tacc),
                tns=pick3(fresh["tns"], tns, tns),
                sgr=pick3(fresh["sgr"], gr_draw, p.sgr),
                sn=pick3(fresh["sn"], zero_i, sn),
                snl=pick3(
                    fresh["snl"],
                    jnp.int32(1) << jnp.minimum(tdep, max_depth - 1),
                    p.snl,
                ),
                sz=pick3(fresh["sz"], edge_z, z),
                sr=pick3(fresh["sr"], edge_r, r),
                sg=pick3(fresh["sg"], edge_g, g),
                szp=pick3(fresh["szp"], edge_z, szp),
                spep=pick3(fresh["spep"], zero_f, spep),
                sgp=pick3(fresh["sgp"], edge_g, sgp),
                slw=pick3(fresh["slw"], neg_inf, slw),
                srs=pick3(fresh["srs"], jnp.zeros((d, C)), srs),
                rck=pick3(fresh["rck"], zero_ck, rck),
                sck=pick3(fresh["sck"], zero_ck, sck),
                sturn=pick3(fresh["sturn"], jnp.zeros((C,), bool), sturn),
                sdiv=pick3(fresh["sdiv"], jnp.zeros((C,), bool), sdiv),
                sacc=pick3(fresh["sacc"], zero_f, sacc),
                esg=pick3(
                    fresh["esg"], jnp.where(gr_draw, p.eps, -p.eps), p.esg
                ),
            )

        zero_i = jnp.zeros((C,), jnp.int32)
        K = max(1, config.pipeline_unroll)
        F = n_frames
        ring0, out0 = recorder_init_cl(
            C, F, {"position": (d,), "potential_energy": ()}
        )

        def cond2(c):
            return cond(c[0])

        def body2(c):
            p, ring, out = c
            for _ in range(K):
                if F > 0:
                    # Chains whose next write would leave the live ring
                    # window are frozen wholesale (every _Pipe leaf is
                    # per-chain); their key stream pauses with them, so
                    # the resumed trajectory is bitwise the step_n one.
                    frozen = ~recorder_drift_ok(p.done, thinning) & (
                        p.done < n_steps
                    )
                    before = p.done
                    p_new = body(p)
                    merged = {}
                    for name, old_v, new_v in zip(_Pipe._fields, p, p_new):
                        sel = _sel_keys if name == "keys" else _sel
                        merged[name] = jax.tree.map(
                            lambda o, nv, s=sel: s(frozen, o, nv),
                            old_v, new_v,
                        )
                    p = _Pipe(**merged)
                    ring = recorder_write_cl(
                        ring, before, p.done, thinning,
                        {"position": p.x, "potential_energy": p.pe},
                    )
                    out = recorder_flush_cl(ring, out, p.done, thinning, F)
                else:
                    p = body(p)
            return (p, ring, out)

        p, _, out = lax.while_loop(cond2, body2, (p0, ring0, out0))
        bx = jnp.transpose(out["position"], (2, 0, 1))     # (C, F, d)
        bpe = out["potential_energy"].T                    # (C, F)
        final = NUTSState(
            i=state.i + n_steps,
            position=p.x.T,
            potential_energy=p.pe,
            pe_grad=p.grad.T,
            mean_accept_prob=p.mean_ap,
            num_steps=p.ns_last,
            diverging=p.div_last,
            adapt_state=NUTSAdaptState(
                da=p.da,
                inv_mass=jnp.moveaxis(p.inv_mass, -1, 0),
                chol_inv_mass=jnp.moveaxis(p.chol, -1, 0),
                welford=WelfordState(
                    p.wf.count, jnp.moveaxis(p.wf.mean, -1, 0),
                    jnp.moveaxis(p.wf.m2, -1, 0),
                ),
            ),
            rng_key=p.keys,
        )
        return final, {"position": bx, "potential_energy": bpe}

    def step_n(state: NUTSState, n_steps: int) -> NUTSState:
        return _drive(state, n_steps, 0, 1)[0]

    def collect_n(state: NUTSState, n_frames: int, thinning: int = 1):
        return _drive(state, n_frames * thinning, n_frames, thinning)

    return Kernel(
        name="nuts",
        target=target,
        config=config,
        init=jax.jit(init, static_argnames=("n_chains",)),
        step=jax.jit(step),
        step_n=(
            jax.jit(step_n, static_argnames=("n_steps",))
            if config.pipeline
            else None
        ),
        collect_n=(
            jax.jit(collect_n, static_argnames=("n_frames", "thinning"))
            if config.pipeline
            else None
        ),
        collect_fields=("position", "potential_energy"),
    )
