"""Fused whole-step ARWMH as a single Pallas TPU kernel.

The XLA ARWMH step (kernels/arwmh.py) dispatches ~50 fused ops per
transition and round-trips the (C, d, d) Cholesky factor through HBM at
least twice per step (once into the separate rank-1-update Pallas kernel,
once out) — measured ~7.6 us/step fixed cost at 100 chains and ~17 us at
4096 chains, dominated by dispatch + HBM traffic rather than arithmetic.

This kernel runs the ENTIRE transition loop on-chip: the chain state
(position, potential, running mean, Cholesky factor, step size) lives in
VMEM scratch for the whole call, noise comes from the core PRNG
(Box-Muller over ``pltpu.prng_random_bits``), the proposal matvec and the
rank-1 Cholesky column recursion are unrolled over the small ``d`` axis
with chains riding the 128-wide lanes, and thinned draws stream to HBM
through per-chunk output blocks.  One kernel launch per
``step_n``/``collect_n`` call — zero per-step dispatch.

Semantics are the reference recursion exactly (arwmh.py:140-207 of the
reference; see kernels/arwmh.py for the mapping), reproduced op-for-op
from the jnp implementation:

  * proposal   x' = x + (L e^lam + eps I) @ N(0, I)
  * NaN potential -> +inf, MH accept via exp(U - U')
  * adaptation clock resets at the warmup boundary (``adaptation_lr``)
  * mu' = mu + gamma d ;  L' = chol((1-gamma) L L^T + gamma d d^T)
    (GGMS74 method C1 column recursion, NaN-guarded per chain)
  * log lam' = log lam + gamma (alpha - alpha*)
  * as_change = ||L' e^lam' - L e^lam||_F

RNG provenance: the production path draws from the TPU core PRNG, so its
streams differ from the ``jax.random`` streams of the lockstep step —
statistically identical, validated by distribution tests.  For exact
verification the kernel also accepts *injected* noise/uniform buffers
(``noise``/``unif``), in which mode it is deterministic and is asserted
close to N sequential ``step()`` calls in tests/test_pallas.py (interpret
mode on CPU, compiled on TPU).

Layout: chains-last everywhere inside the kernel — x, loc: (d, Cb);
L: (d, d, Cb); scalars: (1, Cb) — so every op is a dense lane-wide tile
and the d-axis recursions unroll at trace time (d is static and small).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_TWO_PI = 6.2831853071795864769


def _bits01(shape):
    """Uniform [0, 1) from the top 24 bits of the core PRNG (the raw bits
    come back as signed int32 — bitcast before shifting so the shift
    doesn't sign-extend)."""
    b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits fit in int32; Mosaic lacks a uint32->f32 cast
    b24 = pltpu.bitcast(b >> 8, jnp.int32)
    return b24.astype(jnp.float32) * (2.0 ** -24)


def _standard_normal(shape):
    """Box-Muller over core-PRNG bits: z ~ N(0,1) of ``shape`` (f32)."""
    u1 = 1.0 - _bits01(shape)   # (0, 1]: log stays finite
    u2 = _bits01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _uniform(shape):
    return _bits01(shape)


def build_fused_arwmh(target, config):
    """Return ``drive(state_tuple, n_steps, n_frames, thinning, seed,
    noise=None, unif=None, interpret=False)`` executing ``n_steps`` fused
    ARWMH transitions.

    ``state_tuple`` is (x, pe, map, loc, L, loglam, i0) with framework
    (chains-first) layouts; returns (new_state_tuple, frames): the new
    state tuple gains a trailing ``as_change`` (C,) entry, and frames is
    ``{"position": (C, F, d), "potential_energy": (C, F),
    "as_change": (C, F)}`` (empty dict when ``n_frames == 0``).
    """
    d = target.dim
    # Pallas kernels may not capture array constants (the target's data
    # vectors live in the potential's closure) — trace the potential to a
    # jaxpr, pull its embedded constants out, and feed them back in as
    # replicated kernel inputs.  pot_conv(x, *consts) is the pure
    # potential.
    _closed = jax.make_jaxpr(target.potential_fn)(
        jnp.zeros((d,), jnp.float32)
    )
    consts = [jnp.asarray(c) for c in _closed.consts]

    def pot_conv(x, *cvals):
        return jax.core.eval_jaxpr(_closed.jaxpr, cvals, x)[0]

    def potential_cl(xb, cvals):
        """chains-last batched potential: (d, Cb) -> (Cb,)."""
        return jax.vmap(
            lambda xc: pot_conv(xc, *cvals), in_axes=1
        )(xb)
    lr_decay = float(config.lr_decay)
    target_ap = float(config.target_accept_prob)
    eps = float(config.eps)
    W = int(config.num_warmup)

    def _gamma_of(i):
        """adaptation_lr (kernels/base.py): clock resets after warmup."""
        itr = i + 1
        n = jnp.where(i < W, itr, itr - W)
        nf = n.astype(jnp.float32)
        # n^(-lr_decay) as exp/log: Mosaic has no powf lowering
        gamma = (
            (1.0 / nf) if lr_decay == 1.0
            else jnp.exp(-lr_decay * jnp.log(nf))
        )
        return nf, gamma

    def _as_change(L_new, lam_new, L, lam):
        """||L' e^lam' - L e^lam||_F per chain — 2 d^2 tile ops, so the
        driver computes it only on recorded / final steps."""
        diff = L_new * jnp.exp(lam_new) - L * jnp.exp(lam)
        return jnp.sqrt(jnp.sum(diff * diff, axis=(0, 1)))[None, :]

    def _one_step(i, x, pe, map_, loc, L, loglam, z, u, cvals):
        """One ARWMH transition on chains-last blocks.  ``z``: (d, Cb)
        standard normals, ``u``: (1, Cb) uniforms."""
        step_size = jnp.exp(loglam)                      # (1, Cb)
        # y = (L e^lam + eps I) @ z, unrolled over columns
        y = eps * z
        for j in range(d):
            y = y + (L[:, j, :] * step_size) * z[j:j + 1, :]
        x_prop = x + y                                    # (d, Cb)

        pe_prop = potential_cl(x_prop, cvals)[None, :]    # (1, Cb)
        pe_prop = jnp.where(jnp.isnan(pe_prop), jnp.inf, pe_prop)
        accept_prob = jnp.minimum(jnp.exp(pe - pe_prop), 1.0)
        accepted = u < accept_prob                        # (1, Cb)
        x_new = jnp.where(accepted, x_prop, x)
        pe_new = jnp.where(accepted, pe_prop, pe)

        nf, gamma = _gamma_of(i)
        map_new = map_ + (accept_prob - map_) / nf

        # --- covariance adaptation: L' = chol((1-g) L L^T + g dd^T) ----
        delta = x_new - loc                               # (d, Cb)
        loc_new = loc + gamma * delta
        # rank1(sqrt(1-g) L, delta, g): GGMS74 C1 column recursion with
        # chains on lanes (same math as ops/pallas/chol_update.py)
        sq = jnp.sqrt(1.0 - gamma)
        a = jnp.full((1, x.shape[1]), gamma, jnp.float32)
        w = delta
        cols = []
        isnan_any = jnp.zeros((1, x.shape[1]), jnp.bool_)
        for j in range(d):
            col = sq * L[:, j, :]                         # (d, Cb)
            diag = col[j:j + 1, :]                        # (1, Cb)
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
            # strict lower-triangularity (fp dust above the diagonal)
            mask = (
                jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0) >= j
            )
            col_new = jnp.where(mask, col_new, 0.0)
            isnan_any = isnan_any | jnp.any(
                jnp.isnan(col_new), axis=0, keepdims=True
            )
            cols.append(col_new)
        L_new = jnp.stack(cols, axis=1)                   # (d, d, Cb)
        # NaN guard: keep the old factor where the update went indefinite
        L_new = jnp.where(isnan_any[None, :, :], L, L_new)

        loglam_new = loglam + gamma * (accept_prob - target_ap)
        return x_new, pe_new, map_new, loc_new, L_new, loglam_new

    def _make_kernel(n_steps: int, n_frames: int, thinning: int,
                     fc: int, inject: bool):
        n_chunks = max(1, -(-n_frames // fc)) if n_frames else 1

        def kernel(seed_ref, i0_ref, x_ref, pe_ref, map_ref, loc_ref,
                   L_ref, lam_ref, *rest):
            cvals = [
                r[...].reshape(c.shape)
                for r, c in zip(rest[: len(consts)], consts)
            ]
            rest = rest[len(consts):]
            if inject:
                noise_ref, unif_ref = rest[0], rest[1]
                rest = rest[2:]
            (xo_ref, peo_ref, mapo_ref, loco_ref, Lo_ref, lamo_ref,
             aso_ref) = rest[:7]
            if n_frames:
                fx_ref, fpe_ref, fas_ref = rest[7:10]
                (xs, pes, maps, locs, Ls, lams) = rest[10:]
            else:
                (xs, pes, maps, locs, Ls, lams) = rest[7:]

            i = pl.program_id(0)
            j = pl.program_id(1)
            if not inject:
                # one distinct stream per (chain-block, chunk); Mosaic
                # supports at most two seed operands
                pltpu.prng_seed(seed_ref[0], i * n_chunks + j)

            @pl.when(j == 0)
            def _init():
                xs[:] = x_ref[:]
                pes[:] = pe_ref[:]
                maps[:] = map_ref[:]
                locs[:] = loc_ref[:]
                Ls[:] = L_ref[:]
                lams[:] = lam_ref[:]

            i0 = i0_ref[0]
            base = j * fc * thinning
            steps_here = (
                jnp.minimum(fc * thinning, n_steps - base)
                if n_frames else n_steps
            )

            def body(s, carry):
                x, pe, map_, loc, L, lam, as_chg = carry
                if inject:
                    z = noise_ref[base + s, :, :]
                    u = unif_ref[base + s, :, :]
                else:
                    z = _standard_normal((d, x.shape[1]))
                    u = _uniform((1, x.shape[1]))
                xn, pen, mapn, locn, Ln, lamn = _one_step(
                    i0 + base + s, x, pe, map_, loc, L, lam, z, u, cvals
                )
                # as_change costs ~2 d^2 tile ops — compute it only when
                # it's observable (a recorded frame or the final step)
                is_last = (base + s) == (n_steps - 1)
                if n_frames:
                    is_frame = (base + s + 1) % thinning == 0
                    need = is_frame | is_last
                else:
                    need = is_last
                as_chg = jax.lax.cond(
                    need,
                    lambda: _as_change(Ln, lamn, L, lam),
                    lambda: as_chg,
                )
                if n_frames:
                    @pl.when((base + s + 1) % thinning == 0)
                    def _rec():
                        f = (s + 1) // thinning - 1  # frame idx in chunk
                        fx_ref[f] = xn
                        fpe_ref[f] = pen[0]
                        fas_ref[f] = as_chg[0]
                return (xn, pen, mapn, locn, Ln, lamn, as_chg)

            carry0 = (
                xs[:], pes[:], maps[:], locs[:], Ls[:], lams[:],
                jnp.zeros((1, xs.shape[1]), jnp.float32),
            )
            x, pe, map_, loc, L, lam, as_chg = jax.lax.fori_loop(
                0, steps_here, body, carry0
            )
            xs[:] = x
            pes[:] = pe
            maps[:] = map_
            locs[:] = loc
            Ls[:] = L
            lams[:] = lam

            @pl.when(j == n_chunks - 1)
            def _out():
                xo_ref[:] = x
                peo_ref[:] = pe
                mapo_ref[:] = map_
                loco_ref[:] = loc
                Lo_ref[:] = L
                lamo_ref[:] = lam
                aso_ref[:] = as_chg

        return kernel, n_chunks

    @partial(
        jax.jit,
        static_argnames=("n_steps", "n_frames", "thinning", "interpret"),
    )
    def drive(state, n_steps: int, n_frames: int = 0, thinning: int = 1,
              seed: Array = None, noise: Array = None, unif: Array = None,
              interpret: bool = False):
        x, pe, map_, loc, L, loglam, i0 = state
        C = x.shape[0]
        inject = noise is not None

        # Widest power-of-two chain block that fits VMEM.  Mosaic's
        # scoped-vmem stack for this kernel measures ~3x the naive
        # in+out+scratch block accounting (first-hardware-contact OOM:
        # 31.05 MB at d=10, cb=4096 = ~1.9k f32/lane), so the cap uses
        # a measured per-lane coefficient and we raise the scoped limit
        # from the 16 MB default to 100 MB (v5e VMEM is 128 MB) via
        # CompilerParams below, targeting <= ~64 MB actual.
        per_lane_f32 = 19 * d * d + 60 * d + 120
        cb_cap = max(_LANE, 1 << ((64_000_000 // (4 * per_lane_f32))
                                  .bit_length() - 1))
        cb = _LANE
        while cb * 2 <= min(C, cb_cap, 4096):
            cb *= 2
        pad = (-C) % cb
        if pad:
            eye = jnp.broadcast_to(jnp.eye(d, dtype=L.dtype), (pad, d, d))
            x = jnp.concatenate([x, jnp.zeros((pad, d))], axis=0)
            pe = jnp.concatenate([pe, jnp.zeros((pad,))], axis=0)
            map_ = jnp.concatenate([map_, jnp.zeros((pad,))], axis=0)
            loc = jnp.concatenate([loc, jnp.zeros((pad, d))], axis=0)
            L = jnp.concatenate([L, eye], axis=0)
            loglam = jnp.concatenate([loglam, jnp.zeros((pad,))], axis=0)
        Cp = C + pad

        # chains-last kernel layouts
        xt = x.T                                   # (d, Cp)
        pet = pe[None, :]
        mapt = map_[None, :]
        loct = loc.T
        Lt = jnp.transpose(L, (1, 2, 0))           # (d, d, Cp)
        lamt = loglam[None, :]

        # frame-chunk size: bound the VMEM frame staging block to ~1 MB
        # (it is double-buffered by the pipeline)
        fc = max(1, min(n_frames, (1 << 18) // max(1, d * cb))) if (
            n_frames
        ) else 1
        kernel, n_chunks = _make_kernel(
            n_steps, n_frames, thinning, fc, inject
        )
        grid = (Cp // cb, n_chunks) if n_frames else (Cp // cb, 1)
        Fp = n_chunks * fc

        # NOTE: under PrefetchScalarGridSpec the index_map is called with
        # the scalar-prefetch refs appended after the grid indices.
        def bs(shape, imap):
            return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

        state_specs = [
            bs((d, cb), lambda i, j, *_: (0, i)),
            bs((1, cb), lambda i, j, *_: (0, i)),
            bs((1, cb), lambda i, j, *_: (0, i)),
            bs((d, cb), lambda i, j, *_: (0, i)),
            bs((d, d, cb), lambda i, j, *_: (0, 0, i)),
            bs((1, cb), lambda i, j, *_: (0, i)),
        ]
        in_specs = list(state_specs)
        inputs = [xt, pet, mapt, loct, Lt, lamt]
        # replicated target-data constants (same block for every program)
        for c in consts:
            c2 = c if c.ndim >= 2 else c.reshape((1, max(1, c.size)))
            nd = c2.ndim
            in_specs.append(
                bs(c2.shape, lambda i, j, *_, _nd=nd: (0,) * _nd)
            )
            inputs.append(c2)
        if inject:
            S = noise.shape[0]
            in_specs += [
                bs((S, d, cb), lambda i, j, *_: (0, 0, i)),
                bs((S, 1, cb), lambda i, j, *_: (0, 0, i)),
            ]
            nt = jnp.transpose(noise, (0, 2, 1))   # (S, d, Cp)
            ut = unif[:, None, :]                  # (S, 1, Cp)
            if pad:
                nt = jnp.pad(nt, ((0, 0), (0, 0), (0, pad)))
                ut = jnp.pad(ut, ((0, 0), (0, 0), (0, pad)))
            inputs += [nt, ut]

        out_shape = [
            jax.ShapeDtypeStruct((d, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
            jax.ShapeDtypeStruct((d, Cp), jnp.float32),
            jax.ShapeDtypeStruct((d, d, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
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
            pltpu.VMEM((d, cb), jnp.float32),
            pltpu.VMEM((1, cb), jnp.float32),
            pltpu.VMEM((1, cb), jnp.float32),
            pltpu.VMEM((d, cb), jnp.float32),
            pltpu.VMEM((d, d, cb), jnp.float32),
            pltpu.VMEM((1, cb), jnp.float32),
        ]

        seed_arr = jnp.asarray(
            [0 if seed is None else seed], jnp.int32
        )
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

        (xo, peo, mapo, loco, Lo, lamo, aso) = outs[:7]
        new_state = (
            xo.T[:C], peo[0, :C], mapo[0, :C], loco.T[:C],
            jnp.transpose(Lo, (2, 0, 1))[:C], lamo[0, :C], i0 + n_steps,
            aso[0, :C],
        )
        frames = {}
        if n_frames:
            fx, fpe, fas = outs[7:]
            frames = {
                "position": jnp.transpose(
                    fx[:n_frames], (2, 0, 1)
                )[:C],                                   # (C, F, d)
                "potential_energy": fpe[:n_frames].T[:C],
                "as_change": fas[:n_frames].T[:C],
            }
        return new_state, frames

    return drive
