"""Scan-based MCMC driver.

Replaces the reference's NumPyro ``infer.MCMC`` + ``fori_collect`` stack
(run_eight_schools_wasserstein.py:48-52, SURVEY §3.1) with a single fused
XLA program: warmup is a ``lax.fori_loop`` over the kernel step, sampling is
a ``lax.scan`` whose body runs ``thinning`` inner steps and emits one
collected frame — so thinned sweeps (e.g. the reference's 10M-iteration
diamonds runs with thinning=1000) never materialize unthinned trajectories
in HBM.

Everything is chain-batched: ``run_mcmc`` returns stacked extra-field
trajectories of shape (num_collect, chains, ...), and the whole run —
warmup, sampling, collection — is one ``jit`` region per (kernel, shape)
signature.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _select_fields(state, fields: Sequence[str]):
    return {f: getattr(state, f) for f in fields}


def run_mcmc(
    kernel,
    rng_key: Array,
    num_warmup: int,
    num_samples: int,
    *,
    thinning: int = 1,
    n_chains: int = 1,
    init_position: Optional[Array] = None,
    extra_fields: Sequence[str] = (),
    init_state=None,
    jit: bool = True,
):
    """Run ``num_warmup`` burn-in + ``num_samples`` sampling iterations.

    Returns ``(samples, extras, last_state)`` where ``samples`` has shape
    (num_samples // thinning, chains, dim) in *unconstrained* space and
    ``extras`` maps each requested state field name to its thinned
    trajectory.  Use :class:`MCMC` for the constrained-site convenience API.
    """
    assert num_samples % thinning == 0, "num_samples must divide by thinning"
    num_collect = num_samples // thinning
    sample_field = kernel.sample_field

    # Kernels with a pipelined multi-step driver (ASSS shrinkage trips,
    # NUTS tree building) advance via step_n — data-dependent inner loops
    # interleave across chains instead of running in lockstep.
    step_n = getattr(kernel, "step_n", None)
    # Pipelined thinned-draw collector: records draws inside the driver
    # (one straggler barrier per run instead of per frame).
    collect_n = getattr(kernel, "collect_n", None)
    if collect_n is not None and not (
        {sample_field, *extra_fields}
        <= set(getattr(kernel, "collect_fields", ()))
    ):
        collect_n = None

    def _advance(state, n):
        if step_n is not None:
            return step_n(state, n)
        return lax.fori_loop(0, n, lambda _, s: kernel.step(s), state)

    def _run(rng_key, init_position, init_state):
        state = (
            kernel.init(rng_key, n_chains=n_chains, position=init_position)
            if init_state is None
            else init_state
        )

        if num_warmup:
            state = _advance(state, num_warmup)

        if collect_n is not None:
            state, bufs = collect_n(
                state, n_frames=num_collect, thinning=thinning
            )
            samples = jnp.moveaxis(bufs[sample_field], 0, 1)
            collected = {
                f: jnp.moveaxis(bufs[f], 0, 1) for f in extra_fields
            }
            return samples, collected, state

        def body(state, _):
            state = _advance(state, thinning)
            out = {sample_field: getattr(state, sample_field)}
            out.update(_select_fields(state, extra_fields))
            return state, out

        state, collected = lax.scan(body, state, None, length=num_collect)
        samples = collected.pop(sample_field)
        return samples, collected, state

    if jit:
        _run = jax.jit(_run)
    return _run(rng_key, init_position, init_state)


class MCMC:
    """Convenience driver mirroring the reference's usage surface
    (``infer.MCMC(sampler, num_warmup, num_samples, thinning)`` →
    ``.run(key, extra_fields=...)`` → ``.get_samples()`` /
    ``.print_summary()``), built on :func:`run_mcmc`.
    """

    def __init__(
        self,
        kernel,
        *,
        num_warmup: int,
        num_samples: int,
        thinning: int = 1,
        n_chains: int = 1,
    ):
        self.kernel = kernel
        self.num_warmup = num_warmup
        self.num_samples = num_samples
        self.thinning = thinning
        self.n_chains = n_chains
        self._samples = None
        self._extras = None
        self.last_state = None

    def run(self, rng_key, *, init_position=None, extra_fields=()):
        # Rebuild the kernel with the driver's warmup count so the
        # adaptation clock resets at the warmup boundary (arwmh.py:181).
        kernel = self.kernel
        if hasattr(kernel.config, "num_warmup") and (
            kernel.config.num_warmup != self.num_warmup
        ):
            factory = _KERNEL_FACTORIES.get(kernel.name)
            if factory is not None:
                cfg = dataclasses.replace(
                    kernel.config, num_warmup=self.num_warmup
                )
                kernel = factory(kernel.target, cfg)
                self.kernel = kernel
            elif getattr(kernel.config, "adapt", True):
                raise ValueError(
                    f"kernel {kernel.name!r} has no registered factory; "
                    f"build it with num_warmup={self.num_warmup} yourself"
                )
            # non-adaptive kernels (e.g. rwm): the warmup clock only
            # normalizes mean_accept_prob — safe to keep as built
        self._samples, self._extras, self.last_state = run_mcmc(
            kernel,
            rng_key,
            self.num_warmup,
            self.num_samples,
            thinning=self.thinning,
            n_chains=self.n_chains,
            init_position=init_position,
            extra_fields=extra_fields,
        )
        return self

    # -- accessors ------------------------------------------------------
    def get_samples(self, *, group_by_chain: bool = False, flat_unconstrained: bool = False):
        """Constrained per-site samples (reference ``mcmc.get_samples()``).

        Default flattens (draws, chains) into one leading axis like NumPyro.
        """
        assert self._samples is not None, "call .run() first"
        x = self._samples  # (T, C, d)
        if not group_by_chain:
            x = x.reshape((-1,) + x.shape[2:])
        if flat_unconstrained:
            return x
        return self.kernel.target.constrain(x)

    def get_extra_fields(self):
        return self._extras

    def print_summary(self):
        from adaptive_mcmc_tpu.infer.diagnostics import summary_table

        print(summary_table(self.kernel.target, self._samples))

    def diagnostics_str(self) -> str:
        """Progress-bar diagnostics string (reference: arwmh.py:214-228,
        asss.py:276-277 feed NumPyro's tqdm).  Field names differ per
        kernel family: ARWMH/ASSS adapt states carry ``log_step_size``
        (log λ); NUTS carries a dual-averaging ``da.log_eps``."""
        s = self.last_state
        if hasattr(s, "mean_accept_prob"):
            ap = float(jnp.mean(s.mean_accept_prob))
            a = getattr(s, "adapt_state", None)
            if hasattr(a, "log_step_size"):
                ss = float(jnp.mean(jnp.exp(a.log_step_size)))
            elif hasattr(a, "da"):
                ss = float(jnp.mean(jnp.exp(a.da.log_eps)))
            else:
                return f"Acceptance rate: {ap:.2f}"
            return f"Acceptance rate: {ap:.2f}, Step size: {ss:.3f}"
        return f"Iteration: {int(s.i)}, Potential Energy: {float(jnp.mean(s.potential_energy)):.2f}"


_KERNEL_FACTORIES = {}


def register_kernel_factory(name: str, factory: Callable):
    _KERNEL_FACTORIES[name] = factory


def sample_pnx(
    kernel,
    rng_key: Array,
    x: Array,
    adapt_state,
    *,
    n: int = 1,
    n_samples: int = 1000,
    mesh=None,
) -> Array:
    """Monte-Carlo sampler of the n-step transition kernel P^n(x, ·) at a
    *frozen* adapt state — the reference's ``sample_Pnx``
    (arwmh.py:230-270), which the whole contraction-diagnostics layer
    builds on.

    ``x``: (n_points, d) probe points.  Returns (n_points, n_samples, d).

    TPU-native shape: instead of nested vmaps over an OO ``sample`` method,
    the (points × samples) grid is flattened into ONE chains axis of size
    n_points * n_samples and rolled forward with the same batched step used
    everywhere else — so it shards over a device mesh like any other run:
    pass ``mesh`` (a 1-D ``chains`` mesh, ``parallel.chain_mesh()``) to
    constrain the flattened chain axis across devices (GSPMD inserts zero
    per-step collectives; the rollout is embarrassingly chain-parallel).
    """
    n_points, d = x.shape
    C = n_points * n_samples

    # Fast path: rebuild the kernel with adaptation disabled so the frozen
    # rollout skips the (discarded) rank-1 Cholesky work entirely.  The
    # reference instead re-runs full adaptation and throws it away every
    # step (arwmh.py:235-245).
    if getattr(kernel.config, "adapt", False) and kernel.name in _KERNEL_FACTORIES:
        cfg = dataclasses.replace(kernel.config, adapt=False)
        kernel = _KERNEL_FACTORIES[kernel.name](kernel.target, cfg)

    adapt_b = jax.tree.map(
        lambda a: jnp.broadcast_to(
            a[:, None] if a.ndim >= 1 else a, (n_points, n_samples) + a.shape[1:]
        ).reshape((C,) + a.shape[1:]),
        adapt_state,
    )
    pos = jnp.broadcast_to(x[:, None, :], (n_points, n_samples, d)).reshape(C, d)

    def _run(rng_key, pos, adapt_b):
        state = kernel.init(
            rng_key, n_chains=C, position=pos, adapt_state=adapt_b
        )
        if mesh is not None:
            from adaptive_mcmc_tpu.parallel.run import _constrain_chain_axis

            state = _constrain_chain_axis(state, mesh, C)
            adapt_b = _constrain_chain_axis(adapt_b, mesh, C)
        # Frozen-adaptation semantics of the reference (i=0, adapt_state
        # fixed every step): enforced by pinning both after each step, in
        # case the kernel has no non-adaptive rebuild path.
        def body(_, s):
            s2 = kernel.step(s)
            return s2._replace(i=jnp.zeros((), jnp.int32), adapt_state=adapt_b)

        state = lax.fori_loop(0, n, body, state)
        return state.position.reshape(n_points, n_samples, d)

    return jax.jit(_run)(rng_key, pos, adapt_b)


def get_init_adapt_state(kernel, rng_key, position=None, n_chains: int = 1):
    """Adapt state right after init (reference get_init_adapt_state,
    arwmh.py:272-276)."""
    return kernel.init(rng_key, n_chains=n_chains, position=position).adapt_state
