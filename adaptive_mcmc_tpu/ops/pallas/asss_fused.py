"""Fused whole-sweep ASSS as a single Pallas TPU kernel.

The pipelined XLA driver (kernels/asss.py::step_n) already interleaves
shrinkage trips across chains — one batched potential evaluation per
while-iteration — but each iteration still dispatches ~60-100 fused XLA
ops and round-trips the full carry through HBM.  At the w_eval sweep
shape (100 chains) that fixed cost, not arithmetic, is the wall.

This kernel runs the SAME per-chain state machine entirely on-chip: the
chain state (position, potential, adaptation loc/scale factor) and the
open-transition state (sphere point z, great-circle velocity v, slice
level t, bracket [tmin, tmax], trip counter) live in VMEM scratch for
the whole call; every `lax.while_loop` iteration draws one batched
uniform/normal block from the core PRNG, performs ONE in-kernel batched
potential evaluation (the target's jaxpr is traced and its constants fed
in as replicated inputs, same mechanism as arwmh_fused.py), and advances
each chain by masked lane ops.  Thinned draws stream to HBM through
per-chunk output blocks; a chunk boundary is the only synchronisation
point (chains that finish a chunk's frame window idle until stragglers
catch up — the in-kernel analog of the XLA driver's recorder drift
gate).

Transition semantics are kernels/asss.py::step_n exactly (itself mapped
line-by-line to the reference's asss.py recursion — see that docstring):
stereographic projection with an unrolled forward-substitution whitening
solve, slice level reusing the stored U(x), √d-scaled factor with +eps·I,
pole guard, ≤``max_shrinkage_iters`` trips with θ=0 bail-out, per-chain
adaptation clock (warmup-boundary reset) driving the GGMS74-C1 rank-1
Cholesky recursion with per-chain NaN guard, and as_change =
‖Δloc‖₂ + ‖Δscale‖_F recorded on landings.

RNG provenance: the production path draws from the TPU core PRNG
(Box-Muller normals, 24-bit uniforms) — streams differ from the XLA
driver's threefry but are statistically identical; for exact
verification the kernel accepts injected per-iteration draw buffers
(``unif3``/``n01``) and is then deterministic (asserted against a plain
jnp replay of the state machine in tests/test_pallas.py).

Gated OFF by default (ASSSConfig.fused) until measured on hardware —
see docs/R3_CHECKLIST.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaptive_mcmc_tpu.ops.pallas.arwmh_fused import (
    _standard_normal,
    _uniform,
)

Array = jax.Array

_LANE = 128
_TWO_PI = 6.2831853071795864769


def build_fused_asss(target, config):
    """Return ``drive(state_tuple, n_steps, n_frames, thinning, seed,
    unif3=None, n01=None, interpret=False)`` executing ``n_steps`` fused
    ASSS transitions per chain.

    ``state_tuple`` is (x, pe, loc, scale, i0) with framework
    (chains-first) layouts; returns (new_state_tuple, frames) where the
    new tuple gains a trailing as_change (C,) entry and frames is
    ``{"position": (C, F, d), "potential_energy": (C, F),
    "as_change": (C, F)}`` (empty when ``n_frames == 0``).

    Injected mode: ``unif3`` (S, 3, C) rows = (u_shrink, u_level,
    u_theta) and ``n01`` (S, d+1, C) velocity normals, consumed one row
    per while-iteration (iteration s uses row s) — S must be >= the
    iteration count the machine needs; the final row index is clamped.
    """
    d = target.dim
    _closed = jax.make_jaxpr(target.potential_fn)(
        jnp.zeros((d,), jnp.float32)
    )
    consts = [jnp.asarray(c) for c in _closed.consts]

    def pot_conv(x, *cvals):
        return jax.core.eval_jaxpr(_closed.jaxpr, cvals, x)[0]

    def potential_cl(xb, cvals):
        return jax.vmap(lambda xc: pot_conv(xc, *cvals), in_axes=1)(xb)

    lr_decay = float(config.lr_decay)
    eps = float(config.eps)
    W = int(config.num_warmup)
    max_trips = int(config.max_shrinkage_iters)
    sqrt_d = float(d) ** 0.5
    adapt = bool(config.adapt)

    def _gamma_of(i):
        """Per-chain adaptation_lr: clock resets at the warmup boundary.
        ``i`` (1, Cb) int32."""
        itr = i + 1
        n = jnp.where(i < W, itr, itr - W)
        nf = n.astype(jnp.float32)
        return (
            (1.0 / nf) if lr_decay == 1.0
            else jnp.exp(-lr_decay * jnp.log(nf))
        )

    def _project(x, loc, sig):
        """R^d -> S^d, chains-last blocks: x/loc (d, Cb), sig (d, d, Cb);
        unrolled forward substitution (kernels/asss.py project_cl)."""
        ys = x - loc
        rows = []
        for k in range(d):
            xk = ys[k:k + 1, :] / sig[k, k:k + 1, :]
            rows.append(xk)
            if k + 1 < d:
                ys = ys - sig[:, k, :] * xk
        xr = jnp.concatenate(rows, axis=0)            # (d, Cb)
        nsq = jnp.sum(xr * xr, axis=0, keepdims=True)
        z_head = 2.0 * xr / (nsq + 1.0)
        z_last = (nsq - 1.0) / (nsq + 1.0)
        return jnp.concatenate([z_head, z_last], axis=0)   # (d+1, Cb)

    def _inverse(z, loc, sig):
        xb = z[:d] / (1.0 - z[d:d + 1])
        x = loc
        for j in range(d):
            x = x + sig[:, j, :] * xb[j:j + 1]
        return x

    def _sigma_of(scale):
        """(scale + eps I) * sqrt(d) without materialising an eye: only
        the diagonal rows differ."""
        diag = jax.lax.broadcasted_iota(
            jnp.int32, (d, d, 1), 0
        ) == jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 1)
        return (scale + jnp.where(diag, eps, 0.0)) * sqrt_d

    def _rank1_guarded(scale, delta, gamma):
        """chol((1-g) S S^T + g dd^T) per lane; NaN -> keep ``scale``.
        scale (d, d, Cb), delta (d, Cb), gamma (1, Cb)."""
        sq = jnp.sqrt(1.0 - gamma)
        a = gamma
        w = delta
        cols = []
        isnan_any = jnp.zeros_like(gamma, dtype=jnp.bool_)
        for j in range(d):
            col = sq * scale[:, j, :]
            diag = col[j:j + 1, :]
            inv_diag = 1.0 / diag
            Dj = diag * diag
            p = w[j:j + 1, :]
            Dj_new = Dj + a * p * p
            inv_Dj_new = 1.0 / Dj_new
            sqrt_Dj_new = jnp.sqrt(Dj_new)
            s_w = p * inv_diag
            s_col = sqrt_Dj_new * inv_diag
            s_new = (p * a) * inv_Dj_new * sqrt_Dj_new
            a = a * Dj * inv_Dj_new
            w = w - s_w * col
            col_new = s_col * col + s_new * w
            mask = (
                jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0) >= j
            )
            col_new = jnp.where(mask, col_new, 0.0)
            isnan_any = isnan_any | jnp.any(
                jnp.isnan(col_new), axis=0, keepdims=True
            )
            cols.append(col_new)
        new = jnp.stack(cols, axis=1)                  # (d, d, Cb)
        return jnp.where(isnan_any[None, :, :], scale, new)

    def _begin(n01, u_level, u_theta, x, pe, loc, sig):
        """Fresh-transition quantities (kernels/asss.py begin)."""
        z = _project(x, loc, sig)
        pe_t = pe + d * jnp.log(1.0 - z[d:d + 1])
        v = n01 - jnp.sum(n01 * z, axis=0, keepdims=True) * z
        v = v / jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
        t_pe = pe_t - jnp.log(u_level)
        theta = u_theta * _TWO_PI
        return z, v, t_pe, theta, theta - _TWO_PI, theta

    def _make_kernel(n_steps: int, n_frames: int, thinning: int,
                     fc: int, inject: bool, s_cap: int):
        n_chunks = max(1, -(-n_frames // fc)) if n_frames else 1

        def kernel(seed_ref, i0_ref, x_ref, pe_ref, loc_ref, S_ref,
                   as_ref, padm_ref, *rest):
            cvals = [
                r[...].reshape(c.shape)
                for r, c in zip(rest[: len(consts)], consts)
            ]
            rest = rest[len(consts):]
            if inject:
                unif3_ref, n01_ref = rest[0], rest[1]
                rest = rest[2:]
            (xo_ref, peo_ref, loco_ref, So_ref, aso_ref) = rest[:5]
            rest = rest[5:]
            if n_frames:
                fx_ref, fpe_ref, fas_ref = rest[:3]
                rest = rest[3:]
            (xs, pes, locs, Ss, ass, zs, vs, ts, ths, tns, txs,
             trips_s, done_s, fresh_s, it_s) = rest

            i = pl.program_id(0)
            j = pl.program_id(1)
            if not inject:
                # one distinct stream per (chain-block, chunk): the PRNG
                # state does NOT persist across grid steps, so reseeding
                # with i alone would replay chunk 0's draws every chunk
                pltpu.prng_seed(seed_ref[0], i * n_chunks + j)

            @pl.when(j == 0)
            def _init():
                xs[:] = x_ref[:]
                pes[:] = pe_ref[:]
                locs[:] = loc_ref[:]
                Ss[:] = S_ref[:]
                ass[:] = as_ref[:]
                zs[:] = jnp.zeros_like(zs)
                vs[:] = jnp.zeros_like(vs)
                ts[:] = jnp.zeros_like(ts)
                ths[:] = jnp.zeros_like(ths)
                tns[:] = jnp.zeros_like(tns)
                txs[:] = jnp.zeros_like(txs)
                trips_s[:] = jnp.zeros_like(trips_s)
                # padded lanes start "already done" (done = n_steps >=
                # every chunk target) so a garbage lane can never gate
                # the while condition
                done_s[:] = padm_ref[:] * n_steps
                fresh_s[:] = jnp.ones_like(fresh_s)
                it_s[:] = jnp.zeros_like(it_s)

            i0 = i0_ref[0]
            # this chunk's per-chain transition target
            tgt = (
                jnp.minimum((j + 1) * fc * thinning, n_steps)
                if n_frames else n_steps
            )

            def cond(c):
                done = c[12]
                return jnp.any(done < tgt)

            def body(c):
                (x, pe, loc, S, as_chg, z, v, t_pe, theta, tmin, tmax,
                 trips, done, fresh, it) = c
                cb = x.shape[1]
                if inject:
                    s = jnp.minimum(it[0, 0], s_cap - 1)
                    u3 = unif3_ref[s]                  # (3, cb)
                    u_shrink = u3[0:1, :]
                    u_level = u3[1:2, :]
                    u_theta = u3[2:3, :]
                    n01 = n01_ref[s]                   # (d+1, cb)
                else:
                    u_shrink = _uniform((1, cb))
                    # (0,1]: log must stay finite
                    u_level = 1.0 - _uniform((1, cb))
                    u_theta = _uniform((1, cb))
                    n01 = _standard_normal((d + 1, cb))
                active = done < tgt

                sig = _sigma_of(S)

                # fresh chains open their first transition with this
                # iteration's draws and do nothing else
                bz, bv, bt, bth, btn, btx = _begin(
                    n01, u_level, u_theta, x, pe, loc, sig
                )
                f = fresh > 0
                # NB: plain (1, cb) masks broadcast fine; spelled-out
                # index tricks like f[None, 0] lower to lax.gather,
                # which Mosaic rejects inside the kernel body.
                z = jnp.where(f, bz, z)
                v = jnp.where(f, bv, v)
                t_pe = jnp.where(f, bt, t_pe)
                theta = jnp.where(f, bth, theta)
                tmin = jnp.where(f, btn, tmin)
                tmax = jnp.where(f, btx, tmax)
                was_fresh = f

                # — the one batched evaluation of this iteration —
                z_th = z * jnp.cos(theta) + v * jnp.sin(theta)
                x_prop = _inverse(z_th, loc, sig)
                u_prop = potential_cl(x_prop, cvals)[None, :]
                u_prop = jnp.where(jnp.isnan(u_prop), jnp.inf, u_prop)
                pole = 1.0 - z_th[d:d + 1]
                good = (
                    (u_prop + d * jnp.log(pole) <= t_pe) & (pole >= eps)
                )
                bail = trips >= max_trips
                land = active & ~was_fresh & (good | bail)
                x_new = jnp.where(
                    land, jnp.where(bail, x, x_prop), x,
                )
                pe_new = jnp.where(land, jnp.where(bail, pe, u_prop), pe)

                if adapt:
                    gamma = _gamma_of(i0 + done)
                    delta = x_new - loc
                    loc_land = loc + gamma * delta
                    S_land = _rank1_guarded(S, delta, gamma)
                    chg = jnp.sqrt(
                        jnp.sum((loc_land - loc) ** 2, axis=0,
                                keepdims=True)
                    ) + jnp.sqrt(
                        jnp.sum((S_land - S) ** 2, axis=(0, 1))
                    )[None, :]
                    loc_new = jnp.where(land, loc_land, loc)
                    S_new = jnp.where(land[None], S_land, S)
                    as_new = jnp.where(land, chg, as_chg)
                else:
                    loc_new, S_new, as_new = loc, S, as_chg
                done_new = done + land.astype(jnp.int32)

                # landed chains open their next transition
                sig_new = _sigma_of(S_new)
                nz, nv, nt, nth, ntn, ntx = _begin(
                    n01, u_level, u_theta, x_new, pe_new, loc_new,
                    sig_new,
                )
                shrink = active & ~was_fresh & ~land
                s_tmin = jnp.where(shrink & (theta < 0.0), theta, tmin)
                s_tmax = jnp.where(shrink & (theta >= 0.0), theta, tmax)
                s_theta = s_tmin + u_shrink * (s_tmax - s_tmin)

                l1 = land
                z = jnp.where(l1, nz, z)
                v = jnp.where(l1, nv, v)
                t_pe = jnp.where(land, nt, t_pe)
                theta = jnp.where(
                    land, nth, jnp.where(shrink, s_theta, theta)
                )
                tmin = jnp.where(land, ntn, s_tmin)
                tmax = jnp.where(land, ntx, s_tmax)
                trips = jnp.where(land, 0, trips + shrink.astype(
                    jnp.int32
                ))
                fresh_new = jnp.zeros_like(fresh)

                if n_frames:
                    rec = land & (done_new % thinning == 0)
                    frow = done_new // thinning - 1 - j * fc  # (1, cb)
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (fc, 1, 1), 0
                    )
                    hit = rec[None, :, :] & (rows == frow[None, :, :])
                    fx_ref[:] = jnp.where(
                        hit, x_new[None, :, :], fx_ref[:]
                    )
                    hit2 = hit[:, 0, :]
                    fpe_ref[:] = jnp.where(hit2, pe_new, fpe_ref[:])
                    fas_ref[:] = jnp.where(hit2, as_new, fas_ref[:])

                return (x_new, pe_new, loc_new, S_new, as_new, z, v,
                        t_pe, theta, tmin, tmax, trips, done_new,
                        fresh_new, it + 1)

            carry0 = (
                xs[:], pes[:], locs[:], Ss[:], ass[:], zs[:], vs[:],
                ts[:], ths[:], tns[:], txs[:], trips_s[:], done_s[:],
                fresh_s[:], it_s[:],
            )
            out = jax.lax.while_loop(cond, body, carry0)
            (x, pe, loc, S, as_chg, z, v, t_pe, theta, tmin, tmax,
             trips, done, fresh, it) = out
            xs[:] = x
            pes[:] = pe
            locs[:] = loc
            Ss[:] = S
            ass[:] = as_chg
            zs[:] = z
            vs[:] = v
            ts[:] = t_pe
            ths[:] = theta
            tns[:] = tmin
            txs[:] = tmax
            trips_s[:] = trips
            done_s[:] = done
            fresh_s[:] = fresh
            it_s[:] = it

            @pl.when(j == n_chunks - 1)
            def _out():
                xo_ref[:] = x
                peo_ref[:] = pe
                loco_ref[:] = loc
                So_ref[:] = S
                aso_ref[:] = as_chg

        return kernel, n_chunks

    @partial(
        jax.jit,
        static_argnames=("n_steps", "n_frames", "thinning", "interpret"),
    )
    def drive(state, n_steps: int, n_frames: int = 0, thinning: int = 1,
              seed: Array = None, unif3: Array = None, n01: Array = None,
              interpret: bool = False):
        x, pe, loc, S, i0, as_in = state
        C = x.shape[0]
        inject = unif3 is not None

        # widest power-of-two chain block whose scratch + loop carry +
        # frame staging stays well inside VMEM: the dominant terms are
        # the (d, d, cb) scale factor (x3: scratch + carry + sigma) and
        # the (fc, d, cb) frame block.  Mosaic's scoped-vmem stack runs
        # ~3x the naive block accounting on the ARWMH twin (measured:
        # 31 MB vs ~10 MB estimated at d=10, cb=4096).  This kernel's
        # own factor is UNMEASURED (the fused drivers are opt-in after
        # losing the hardware A/B — PERF.md), so budget a 4x factor
        # against a ~48 MB target: overruns fail loudly at compile
        # against the 100 MB scoped limit set via CompilerParams at the
        # call site, never silently.
        per_lane_f32 = 4 * (3 * d * d + 10 * d + 40
                            + (16 * d if n_frames else 0))
        cb_cap = max(_LANE, 1 << ((48_000_000 // (4 * per_lane_f32))
                                  .bit_length() - 1))
        cb = _LANE
        while cb * 2 <= min(C, cb_cap, 4096):
            cb *= 2
        pad = (-C) % cb
        if pad:
            eye = jnp.broadcast_to(jnp.eye(d, dtype=S.dtype), (pad, d, d))
            x = jnp.concatenate([x, jnp.zeros((pad, d))], axis=0)
            pe = jnp.concatenate([pe, jnp.zeros((pad,))], axis=0)
            loc = jnp.concatenate([loc, jnp.zeros((pad, d))], axis=0)
            S = jnp.concatenate([S, eye], axis=0)
            as_in = jnp.concatenate([as_in, jnp.zeros((pad,))], axis=0)
        Cp = C + pad

        xt = x.T
        pet = pe[None, :]
        loct = loc.T
        St = jnp.transpose(S, (1, 2, 0))
        ast = as_in[None, :]

        fc = max(1, min(n_frames, 16)) if n_frames else 1
        s_cap = int(unif3.shape[0]) if inject else 1
        kernel, n_chunks = _make_kernel(
            n_steps, n_frames, thinning, fc, inject, s_cap
        )
        grid = (Cp // cb, n_chunks)
        Fp = n_chunks * fc

        def bs(shape, imap):
            return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

        state_specs = [
            bs((d, cb), lambda i, j, *_: (0, i)),
            bs((1, cb), lambda i, j, *_: (0, i)),
            bs((d, cb), lambda i, j, *_: (0, i)),
            bs((d, d, cb), lambda i, j, *_: (0, 0, i)),
        ]
        in_specs = list(state_specs) + [
            bs((1, cb), lambda i, j, *_: (0, i)),
            bs((1, cb), lambda i, j, *_: (0, i)),
        ]
        pad_mask = (jnp.arange(Cp) >= C).astype(jnp.int32)[None, :]
        inputs = [xt, pet, loct, St, ast, pad_mask]
        for c in consts:
            c2 = c if c.ndim >= 2 else c.reshape((1, max(1, c.size)))
            nd = c2.ndim
            in_specs.append(
                bs(c2.shape, lambda i, j, *_, _nd=nd: (0,) * _nd)
            )
            inputs.append(c2)
        if inject:
            Si = unif3.shape[0]
            in_specs += [
                bs((Si, 3, cb), lambda i, j, *_: (0, 0, i)),
                bs((Si, d + 1, cb), lambda i, j, *_: (0, 0, i)),
            ]
            u3 = unif3
            nb = n01
            if pad:
                u3 = jnp.pad(u3, ((0, 0), (0, 0), (0, pad)))
                nb = jnp.pad(nb, ((0, 0), (0, 0), (0, pad)))
            inputs += [u3, nb]

        out_shape = [
            jax.ShapeDtypeStruct((d, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
            jax.ShapeDtypeStruct((d, Cp), jnp.float32),
            jax.ShapeDtypeStruct((d, d, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
        ]
        out_specs = list(state_specs) + [
            bs((1, cb), lambda i, j, *_: (0, i))
        ]
        if n_frames:
            out_shape += [
                jax.ShapeDtypeStruct((Fp, d, Cp), jnp.float32),
                jax.ShapeDtypeStruct((Fp, Cp), jnp.float32),
                jax.ShapeDtypeStruct((Fp, Cp), jnp.float32),
            ]
            out_specs += [
                bs((fc, d, cb), lambda i, j, *_: (j, 0, i)),
                bs((fc, cb), lambda i, j, *_: (j, i)),
                bs((fc, cb), lambda i, j, *_: (j, i)),
            ]

        scratch = [
            pltpu.VMEM((d, cb), jnp.float32),       # x
            pltpu.VMEM((1, cb), jnp.float32),       # pe
            pltpu.VMEM((d, cb), jnp.float32),       # loc
            pltpu.VMEM((d, d, cb), jnp.float32),    # scale
            pltpu.VMEM((1, cb), jnp.float32),       # as_change
            pltpu.VMEM((d + 1, cb), jnp.float32),   # z
            pltpu.VMEM((d + 1, cb), jnp.float32),   # v
            pltpu.VMEM((1, cb), jnp.float32),       # t_pe
            pltpu.VMEM((1, cb), jnp.float32),       # theta
            pltpu.VMEM((1, cb), jnp.float32),       # tmin
            pltpu.VMEM((1, cb), jnp.float32),       # tmax
            pltpu.VMEM((1, cb), jnp.int32),         # trips
            pltpu.VMEM((1, cb), jnp.int32),         # done
            pltpu.VMEM((1, cb), jnp.int32),         # fresh
            pltpu.VMEM((1, cb), jnp.int32),         # iteration counter
        ]

        seed_arr = jnp.asarray([0 if seed is None else seed], jnp.int32)
        i0_arr = jnp.asarray([i0], jnp.int32)

        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(seed_arr, i0_arr, *inputs)

        (xo, peo, loco, So, aso) = outs[:5]
        new_state = (
            xo.T[:C], peo[0, :C], loco.T[:C],
            jnp.transpose(So, (2, 0, 1))[:C], i0 + n_steps, aso[0, :C],
        )
        frames = {}
        if n_frames:
            fx, fpe, fas = outs[5:]
            frames = {
                "position": jnp.transpose(fx[:n_frames], (2, 0, 1))[:C],
                "potential_energy": fpe[:n_frames].T[:C],
                "as_change": fas[:n_frames].T[:C],
            }
        return new_state, frames

    return drive
