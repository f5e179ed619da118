"""ASSS — Adaptive Stereographic Slice Sampler.

TPU-native rebuild of the reference kernel (asss.py:192-269): map the chain
to the unit sphere S^d via an adaptively-whitened stereographic projection,
slice-sample along a random great circle with bracket shrinkage, map back,
and adapt (loc, scale) by the same running-mean / rank-1-Cholesky recursion
as ARWMH (no step size — slice sampling is rejection-free).

Semantics preserved (verified in tests/test_asss.py):
  * whitening radius σ^{1/2} = (scale + ε I)·√d                (asss.py:218)
  * transformed PE U(x(z)) + d·log(1 − z_{d+1})                (asss.py:222-225)
  * tangent velocity: project N(0, I_{d+1}) orthogonal to z,
    normalize                                                  (asss.py:231-233)
  * slice level t = PE − log u                                 (asss.py:236-237)
  * great-circle shrinkage: θ ~ U(0, 2π), bracket [θ−2π, θ],
    shrink while PE(z_θ) > t or pole distance < ε; ≤ 50 iters,
    bail-out θ = 0                                             (asss.py:59-96)
  * adaptation + NaN guard identical to ARWMH                  (asss.py:246-255)
  * as_change = ‖Δloc‖₂ + ‖Δscale‖_F                           (asss.py:259-260)

TPU-first difference: the per-chain, data-dependent shrinkage ``while_loop``
becomes ONE batched loop over all chains with per-chain active masks — the
loop runs until every chain has landed (or hit the 50-iteration bound), and
each trip evaluates the batched transformed potential once for the whole
chain block (dense (C, d) work instead of C divergent scalar loops).
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
    recorder_drift_ok,
    recorder_flush_cl,
    recorder_init_cl,
    recorder_write_cl,
    split_keys,
)
from adaptive_mcmc_tpu.ops.cholesky import (
    adaptive_scale_update,
    adaptive_scale_update_cl,
)

Array = jax.Array
_TWO_PI = 6.283185307179586


@dataclasses.dataclass(frozen=True)
class ASSSConfig:
    lr_decay: float = 2.0 / 3.0
    eps: float = 1e-6
    max_shrinkage_iters: int = 50
    num_warmup: int = 0
    adapt: bool = True
    # Bodies per while-loop iteration in the pipelined drivers (step_n /
    # collect_n).  The body is fully masked on inactive chains, so extra
    # applications are no-ops; unrolling amortises the loop's fixed cost
    # (cond reduction + carry round-trip) over K batched evaluations.
    pipeline_unroll: int = 4
    # Fused whole-sweep Pallas driver (ops/pallas/asss_fused.py): the
    # whole per-chain state machine runs inside ONE kernel launch per
    # step_n/collect_n call.  None = opt-in via AMT_ASSS_FUSED=1 on TPU
    # (interpret-tested, not yet measured on hardware — see
    # docs/R3_CHECKLIST.md); True/False forces.
    fused: Optional[bool] = None


class ASSSAdaptState(NamedTuple):
    loc: Array    # (C, d)
    scale: Array  # (C, d, d) lower-triangular


class ASSSState(NamedTuple):
    i: Array
    position: Array           # (C, d)
    potential_energy: Array   # (C,)
    adapt_state: ASSSAdaptState
    as_change: Array          # (C,)
    rng_key: Array            # (C,) per-chain keys


# --- batched stereographic maps (asss.py:33-56) ---------------------------

def stereographic_project(x: Array, loc: Array, scale: Array) -> Array:
    """R^d -> S^d, whitened by lower-triangular ``scale``; batched over a
    leading chains axis."""
    xs = x - loc
    xr = lax.linalg.triangular_solve(
        scale, xs[..., None], left_side=True, lower=True
    )[..., 0]
    nsq = jnp.sum(xr * xr, axis=-1, keepdims=True)
    z_head = 2.0 * xr / (nsq + 1.0)
    z_last = (nsq - 1.0) / (nsq + 1.0)
    return jnp.concatenate([z_head, z_last], axis=-1)


def stereographic_inverse(z: Array, loc: Array, scale: Array) -> Array:
    """S^d -> R^d (batched)."""
    x_base = z[..., :-1] / (1.0 - z[..., -1:])
    return (
        jnp.einsum("...ij,...j->...i", scale, x_base,
                   precision=lax.Precision.HIGHEST)
        + loc
    )


def _shrinkage_batched(
    keys, z, v, t_pe, transformed_pe_fn, eps, max_iters
):
    """Batched great-circle shrinkage (asss.py:59-96).

    keys: (C,) per-chain; z, v: (C, d+1); t_pe: (C,).  One while_loop over
    the whole chain block: per-chain brackets shrink under an active mask,
    and the transformed potential is evaluated densely for all chains each
    trip.  Per-chain trip counts and RNG streams match the reference's
    scalar loop (frozen chains stop consuming randomness).
    """
    keys_init, keys_loop = split_keys(keys, 2)
    theta = jax.vmap(jax.random.uniform)(keys_init) * _TWO_PI
    theta_min = theta - _TWO_PI
    theta_max = theta

    def is_bad(theta):
        z_theta = z * jnp.cos(theta)[:, None] + v * jnp.sin(theta)[:, None]
        pe = nan_to_inf(transformed_pe_fn(z_theta))
        return (pe > t_pe) | ((1.0 - z_theta[:, -1]) < eps)

    bad0 = is_bad(theta)
    iters0 = jnp.zeros(theta.shape, jnp.int32)

    def cond(val):
        _, _, _, _, iters, bad = val
        return jnp.any(bad & (iters < max_iters))

    def body(val):
        keys, theta, tmin, tmax, iters, bad = val
        active = bad & (iters < max_iters)
        keys_smp, keys_next = split_keys(keys, 2)
        tmin_new = jnp.where(active & (theta < 0.0), theta, tmin)
        tmax_new = jnp.where(active & (theta >= 0.0), theta, tmax)
        u = jax.vmap(jax.random.uniform)(keys_smp)
        theta_prop = tmin_new + u * (tmax_new - tmin_new)
        theta_new = jnp.where(active, theta_prop, theta)
        keys_new = jax.tree.map(
            lambda a, b: jnp.where(
                active.reshape(active.shape + (1,) * (a.ndim - 1)), a, b
            ),
            keys_next, keys,
        )
        iters_new = iters + active.astype(jnp.int32)
        bad_new = jnp.where(active, is_bad(theta_new), bad)
        return (keys_new, theta_new, tmin_new, tmax_new, iters_new, bad_new)

    _, theta_f, _, _, iters_f, _ = lax.while_loop(
        cond, body, (keys_loop, theta, theta_min, theta_max, iters0, bad0)
    )
    theta_f = jnp.where(iters_f >= max_iters, 0.0, theta_f)
    z_f = z * jnp.cos(theta_f)[:, None] + v * jnp.sin(theta_f)[:, None]
    return z_f, iters_f


def asss(target, config: ASSSConfig = ASSSConfig()) -> Kernel:
    d = target.dim
    batched_potential = jax.vmap(target.potential_fn)
    eye = jnp.eye(d, dtype=jnp.float32)

    def init(
        rng_key: Array,
        n_chains: int = 1,
        position: Optional[Array] = None,
        adapt_state: Optional[ASSSAdaptState] = None,
    ) -> ASSSState:
        key_init, key_run = jax.random.split(rng_key)
        pos = batch_positions(target, key_init, n_chains, position)
        pe = nan_to_inf(batched_potential(pos))
        if adapt_state is None:
            adapt_state = ASSSAdaptState(
                loc=pos, scale=jnp.broadcast_to(eye, (n_chains, d, d))
            )
        return ASSSState(
            i=jnp.zeros((), jnp.int32),
            position=pos,
            potential_energy=pe,
            adapt_state=adapt_state,
            as_change=jnp.zeros((n_chains,)),
            rng_key=jax.random.split(key_run, n_chains),
        )

    def _transition(state: ASSSState):
        """One lockstep transition; also returns the per-chain shrinkage
        trip counts so diagnostics (``probe_trips``) can attribute step
        cost to the data-dependent trip distribution without touching the
        production path (``step`` discards them)."""
        loc, scale = state.adapt_state
        x = state.position
        C = x.shape[0]

        keys, keys_v, keys_t, keys_shrink = split_keys(state.rng_key, 4)

        sigma_sqrt = (scale + config.eps * eye) * (d ** 0.5)

        def transformed_pe(z):
            x_flat = stereographic_inverse(z, loc, sigma_sqrt)
            return batched_potential(x_flat) + d * jnp.log(1.0 - z[:, -1])

        z = stereographic_project(x, loc, sigma_sqrt)
        pe_t = transformed_pe(z)

        v = jax.vmap(lambda k: jax.random.normal(k, (d + 1,)))(keys_v)
        v = v - jnp.sum(v * z, axis=-1, keepdims=True) * z
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

        u_t = jax.vmap(jax.random.uniform)(keys_t)
        t_pe = pe_t - jnp.log(u_t)

        z_new, trips = _shrinkage_batched(
            keys_shrink, z, v, t_pe, transformed_pe,
            config.eps, config.max_shrinkage_iters,
        )

        x_new = stereographic_inverse(z_new, loc, sigma_sqrt)
        pe_new = nan_to_inf(batched_potential(x_new))

        n, gamma = adaptation_lr(state.i, config.num_warmup, config.lr_decay)

        if config.adapt:
            delta = x_new - loc
            loc_new = loc + gamma * delta
            gammas = jnp.full((C,), gamma, jnp.float32)
            scale_new = adaptive_scale_update(scale, delta, gammas)
            as_change = jnp.linalg.norm(loc_new - loc, axis=-1) + (
                jnp.linalg.norm(scale_new - scale, axis=(-2, -1))
            )
            adapt_new = ASSSAdaptState(loc_new, scale_new)
        else:
            adapt_new = state.adapt_state
            as_change = jnp.zeros((C,))

        new_state = ASSSState(
            i=state.i + 1,
            position=x_new,
            potential_energy=pe_new,
            adapt_state=adapt_new,
            as_change=as_change,
            rng_key=keys,
        )
        return new_state, trips

    def step(state: ASSSState) -> ASSSState:
        return _transition(state)[0]

    def probe_trips(state: ASSSState, n_steps: int):
        """Diagnostic: advance ``n_steps`` lockstep transitions from
        ``state`` and return (final_state, per-chain MEAN shrinkage trips
        per transition).  Full dynamics — identical draws to ``step`` —
        so the trip distribution measured is the one the timed step pays
        (PERF.md ablation; VERDICT r3 weak #6)."""
        C = state.position.shape[0]

        def body(carry, _):
            s, tot = carry
            s2, trips = _transition(s)
            return (s2, tot + trips.astype(jnp.float32)), None

        (s_f, tot), _ = lax.scan(
            body, (state, jnp.zeros((C,), jnp.float32)), None,
            length=n_steps,
        )
        return s_f, tot / float(n_steps)

    def _drive(state: ASSSState, n_steps: int, n_frames: int, thinning: int):
        """Advance every chain by exactly ``n_steps`` transitions with the
        shrinkage loops PIPELINED across chains.

        With ``n_frames > 0`` additionally records each chain's every
        ``thinning``-th landed position (+ potential energy, as_change)
        into a preallocated ``(C, n_frames, ...)`` buffer as the chain
        lands it (the ``collect_n`` path) — chains record thinned draws at
        their own pace and only the call boundary synchronises, instead of
        paying the max-over-chains bracket tail at every frame.

        The lockstep ``step`` pays max-over-chains shrinkage trips every
        transition: with C=100 chains a trip-tail target like kidiq
        (per-chain trips mean≈0.6, p99≈8) costs ~9 potential evaluations
        per step even though the average chain needs <2.  Here every
        while-iteration performs exactly ONE batched transformed-PE
        evaluation, and each chain runs its own (draw → shrink → land →
        adapt → next draw) machine: a chain that lands starts its next
        transition immediately instead of idling until the slowest
        chain's bracket closes.  Work per chain tracks ITS OWN trip
        count; the only sync point is this call's boundary (chains that
        finish all ``n_steps`` idle until stragglers catch up, a
        CLT-small tail for n_steps ≥ thinning).

        Layout: everything inside the loop is chains-LAST — positions /
        loc (d, C), sphere points (d+1, C), scale (d, d, C) with chains
        riding the TPU lane axis (a (C, d) tile pads d=4..26 minor onto
        128 lanes, a ~5-30x physical blow-up per op), the whitening solve
        and proposal matvec unrolled over the static d axis, and ALL
        per-trip randomness (bracket uniform, level, angle, d+1 velocity
        normals via erfinv) drawn from ONE batched threefry block per
        trip instead of the 7 per-use splits/draws of the chains-first
        version.

        Transition semantics (bracket shrinkage, √d radius, pole guard,
        bail-out θ=0 at 50 trips, adaptation recursion + NaN guard,
        warmup-boundary clock reset) are identical to ``step``; per-chain
        RNG streams differ only in draw structure.  Two evaluations the
        lockstep path spends per transition are derived instead: the
        slice level reuses the stored U(x) (the projection round-trip
        U(x(z(x))) it replaces is the same quantity), and the landing
        PE is the U(x') already computed by the accepting trip."""
        C = state.position.shape[0]
        i0 = state.i

        batched_potential_cl = jax.vmap(target.potential_fn, in_axes=1)

        def sigma_of(scale):                   # (d, d, C)
            return (scale + config.eps * eye[:, :, None]) * (d ** 0.5)

        def project_cl(x, loc, sigma_sqrt):
            """R^d -> S^d chains-last; the triangular whitening solve is
            an unrolled forward substitution (2d lane-wide ops) instead of
            a batched TriangularSolve on lane-padded (C, d, d) tiles."""
            ys = x - loc                       # (d, C)
            rows = []
            for k in range(d):
                xk = ys[k] / sigma_sqrt[k, k]
                rows.append(xk)
                if k + 1 < d:
                    # rows <= k of ys become stale after this, never read
                    ys = ys - sigma_sqrt[:, k, :] * xk[None, :]
            xr = jnp.stack(rows)               # (d, C)
            nsq = jnp.sum(xr * xr, axis=0, keepdims=True)
            z_head = 2.0 * xr / (nsq + 1.0)
            z_last = (nsq - 1.0) / (nsq + 1.0)
            return jnp.concatenate([z_head, z_last], axis=0)  # (d+1, C)

        def inverse_cl(z, loc, sigma_sqrt):
            xb = z[:d] / (1.0 - z[d:d + 1])
            x = loc
            for j in range(d):
                x = x + sigma_sqrt[:, j, :] * xb[j:j + 1]
            return x

        _SQRT2 = 1.4142135623730951
        _U_LO = -0.99999994  # nextafter(-1, 0) in f32: keeps erfinv finite

        def _trip_draws(k_draw):
            """(u_shrink, u_level, u_theta, velocity normals (d+1, C))
            from ONE batched threefry invocation."""
            U = jax.vmap(lambda k: jax.random.uniform(k, (d + 4,)))(k_draw)
            UT = U.T                           # (d+4, C)
            n01 = _SQRT2 * jax.scipy.special.erfinv(
                jnp.maximum(2.0 * UT[3:] - 1.0, _U_LO)
            )
            return UT[0], UT[1], UT[2], n01

        def begin(n01, u_level, u_theta, x, pe, loc, sigma_sqrt):
            """Fresh-transition quantities (no potential evaluation)."""
            z = project_cl(x, loc, sigma_sqrt)
            pe_t = pe + d * jnp.log(1.0 - z[d])
            v = n01 - jnp.sum(n01 * z, axis=0, keepdims=True) * z
            v = v / jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            t_pe = pe_t - jnp.log(u_level)
            theta = u_theta * _TWO_PI
            return z, v, t_pe, theta, theta - _TWO_PI, theta

        k_keys0, k_draw0 = split_keys(state.rng_key, 2)
        _, ul0, uth0, n01_0 = _trip_draws(k_draw0)
        z0, v0, t0, th0, tmin0, tmax0 = begin(
            n01_0, ul0, uth0, state.position.T, state.potential_energy,
            state.adapt_state.loc.T,
            sigma_of(jnp.transpose(state.adapt_state.scale, (1, 2, 0))),
        )
        carry0 = (
            k_keys0, state.position.T, state.potential_energy,
            state.adapt_state.loc.T,
            jnp.transpose(state.adapt_state.scale, (1, 2, 0)),
            state.as_change, z0, v0, t0, th0, tmin0, tmax0,
            jnp.zeros((C,), jnp.int32),   # trips this transition
            jnp.zeros((C,), jnp.int32),   # steps completed this call
        )

        def cond(c):
            return jnp.any(c[13] < n_steps)

        def body(c):
            (keys, x, pe, loc, scale, as_chg, z, v, t_pe, theta, tmin,
             tmax, trips, done) = c
            active = done < n_steps
            if n_frames > 0:
                # collect path: chains whose next thinned write would
                # leave the live ring window idle until the flush head
                # catches up (every body update is already masked on
                # ``active``, so idling freezes the chain in place and
                # its RNG stream pauses with it — the resumed trajectory
                # is bitwise the step_n one)
                active = active & recorder_drift_ok(done, thinning)
            k_next, k_draw = split_keys(keys, 2)
            u_shrink, u_level, u_theta, n01 = _trip_draws(k_draw)
            keys_new = jnp.where(
                active.reshape(active.shape + (1,) * (k_next.ndim - 1)),
                k_next, keys,
            )
            sigma_sqrt = sigma_of(scale)
            # — the one batched evaluation of this iteration —
            z_th = z * jnp.cos(theta)[None] + v * jnp.sin(theta)[None]
            x_prop = inverse_cl(z_th, loc, sigma_sqrt)
            u_prop = nan_to_inf(batched_potential_cl(x_prop))
            pole = 1.0 - z_th[d]
            good = (u_prop + d * jnp.log(pole) <= t_pe) & (
                pole >= config.eps
            )
            bail = trips >= config.max_shrinkage_iters
            land = active & (good | bail)
            # bail-out lands at θ=0: stay put (asss.py:94)
            x_new = jnp.where(land[None],
                              jnp.where(bail[None], x, x_prop), x)
            pe_new = jnp.where(land, jnp.where(bail, pe, u_prop), pe)
            # adaptation on landing (per-chain clock i0 + done)
            if config.adapt:
                _, gamma = adaptation_lr(
                    i0 + done, config.num_warmup, config.lr_decay
                )
                gamma = gamma.astype(jnp.float32)
                delta = x_new - loc
                loc_land = loc + gamma[None] * delta
                scale_land = adaptive_scale_update_cl(scale, delta, gamma)
                chg = jnp.sqrt(jnp.sum((loc_land - loc) ** 2, axis=0)) + (
                    jnp.sqrt(jnp.sum((scale_land - scale) ** 2, axis=(0, 1)))
                )
                loc_new = jnp.where(land[None], loc_land, loc)
                scale_new = jnp.where(land[None, None], scale_land, scale)
                as_new = jnp.where(land, chg, as_chg)
            else:
                loc_new, scale_new, as_new = loc, scale, as_chg
            done_new = done + land.astype(jnp.int32)
            # landed chains open their next transition; shrinking chains
            # tighten the bracket; finished/idle chains freeze (and stop
            # consuming randomness)
            b_z, b_v, b_t, b_th, b_tmin, b_tmax = begin(
                n01, u_level, u_theta, x_new, pe_new, loc_new,
                sigma_of(scale_new),
            )
            shrink = active & ~land
            s_tmin = jnp.where(shrink & (theta < 0.0), theta, tmin)
            s_tmax = jnp.where(shrink & (theta >= 0.0), theta, tmax)
            s_theta = s_tmin + u_shrink * (s_tmax - s_tmin)

            def pick(land_v, shrink_v, keep_v):
                ml = land.reshape((1,) * (land_v.ndim - 1) + land.shape)
                ms = shrink.reshape((1,) * (land_v.ndim - 1) + shrink.shape)
                return jnp.where(ml, land_v, jnp.where(ms, shrink_v, keep_v))

            z_new = pick(b_z, z, z)
            v_new = pick(b_v, v, v)
            t_new = pick(b_t, t_pe, t_pe)
            th_new = pick(b_th, s_theta, theta)
            tmin_new = pick(b_tmin, s_tmin, tmin)
            tmax_new = pick(b_tmax, s_tmax, tmax)
            trips_new = jnp.where(
                land, 0, trips + shrink.astype(jnp.int32)
            )
            return (keys_new, x_new, pe_new, loc_new, scale_new, as_new,
                    z_new, v_new, t_new, th_new, tmin_new, tmax_new,
                    trips_new, done_new)

        F = n_frames
        ring0, out0 = recorder_init_cl(
            C, F,
            {"position": (d,), "potential_energy": (), "as_change": ()},
        )

        def cond2(cc):
            return cond(cc[0])

        K = max(1, config.pipeline_unroll)

        def body2(cc):
            c, ring, out = cc
            for _ in range(K):
                done_before = c[13]
                c = body(c)
                if F > 0:
                    ring = recorder_write_cl(
                        ring, done_before, c[13], thinning,
                        {"position": c[1], "potential_energy": c[2],
                         "as_change": c[5]},
                    )
                    out = recorder_flush_cl(ring, out, c[13], thinning, F)
            return (c, ring, out)

        c, _, out = lax.while_loop(cond2, body2, (carry0, ring0, out0))
        bx = jnp.transpose(out["position"], (2, 0, 1))      # (C, F, d)
        bpe = out["potential_energy"].T
        bas = out["as_change"].T
        final = ASSSState(
            i=state.i + n_steps,
            position=c[1].T,
            potential_energy=c[2],
            adapt_state=ASSSAdaptState(
                c[3].T, jnp.transpose(c[4], (2, 0, 1))
            ),
            as_change=c[5],
            rng_key=c[0],
        )
        return final, {
            "position": bx, "potential_energy": bpe, "as_change": bas,
        }

    def step_n(state: ASSSState, n_steps: int) -> ASSSState:
        return _drive(state, n_steps, 0, 1)[0]

    def collect_n(state: ASSSState, n_frames: int, thinning: int = 1):
        return _drive(state, n_frames * thinning, n_frames, thinning)

    # ---- fused whole-sweep Pallas driver (opt-in until measured) -------
    use_fused = config.fused
    if use_fused is None:
        import os

        use_fused = (
            jax.default_backend() == "tpu"
            and os.environ.get("AMT_ASSS_FUSED") == "1"
        )
    if use_fused:
        from adaptive_mcmc_tpu.ops.pallas.asss_fused import (
            build_fused_asss,
        )

        fdrive = build_fused_asss(target, config)

        def _fused(state: ASSSState, n_steps, n_frames, thinning):
            # one core-PRNG seed per call, derived from (and advancing)
            # the per-chain key state so repeated calls get fresh streams
            keys_next, k_seed = split_keys(state.rng_key, 2)
            seed = jax.random.key_data(k_seed)[0]
            seed = jnp.asarray(seed).ravel()[0].astype(jnp.int32)
            tup = (
                state.position, state.potential_energy,
                state.adapt_state.loc, state.adapt_state.scale,
                state.i, state.as_change,
            )
            out, frames = fdrive(
                tup, int(n_steps), int(n_frames), int(thinning),
                seed=seed,
            )
            x, pe, loc, S, i_new, as_new = out
            new = ASSSState(
                i=i_new, position=x, potential_energy=pe,
                adapt_state=ASSSAdaptState(loc, S),
                as_change=as_new, rng_key=keys_next,
            )
            return new, frames

        def step_n(state: ASSSState, n_steps: int) -> ASSSState:  # noqa: F811
            return _fused(state, n_steps, 0, 1)[0]

        def collect_n(state: ASSSState, n_frames: int, thinning: int = 1):  # noqa: F811
            return _fused(state, n_frames * thinning, n_frames, thinning)

    return Kernel(
        name="asss",
        target=target,
        config=config,
        init=jax.jit(init, static_argnames=("n_chains",)),
        step=jax.jit(step),
        step_n=jax.jit(step_n, static_argnames=("n_steps",)),
        collect_n=jax.jit(collect_n, static_argnames=("n_frames", "thinning")),
        collect_fields=("position", "potential_energy", "as_change"),
        probe=jax.jit(probe_trips, static_argnames=("n_steps",)),
    )
