"""Target densities as pure flat-vector log-probability functions.

TPU-first replacement for the reference's NumPyro model layer
(``initialize_model`` + ``potential_fn`` over pytrees,
/root/reference/python/kernels/arwmh.py:111-121): a :class:`Target` carries a
hand-written *unconstrained-space* potential function over a flat ``(dim,)``
vector, plus the constrain/unconstrain maps and site metadata needed to
reproduce the reference's postprocessing (``postprocess_fn``,
arwmh.py:209-212) and evaluation comparison spaces
(/root/reference/python/scripts/eval_eight_schools.py:39-51).

Flat vectors (instead of per-step ``ravel_pytree``) keep every kernel step a
static-shape XLA program: no gather/scatter from pytree flattening in the hot
loop, and chains vmap into dense ``(chains, dim)`` arrays that tile onto the
VPU/MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SiteSpec:
    """Metadata for one latent site in the flat unconstrained vector."""

    name: str
    size: int                       # number of flat entries
    shape: Tuple[int, ...]          # constrained-space shape
    transform: str = "identity"     # "identity" | "exp" (support -> (0, inf))


@dataclasses.dataclass(frozen=True)
class Target:
    """A target posterior as a flat unconstrained-space density.

    Attributes
    ----------
    name: identifier used by the experiment harness and checkpoint paths.
    dim: flat unconstrained dimension.
    potential_fn: ``(x: (dim,)) -> scalar`` negative log-density (including
        the log-Jacobian of the unconstraining transforms), matching NumPyro's
        potential-energy convention so kernel semantics carry over verbatim.
    sites: ordered site metadata; order matches the reference's
        ``ravel_pytree`` flattening (alphabetical site names) so adapted
        covariance trajectories are comparable index-by-index.
    """

    name: str
    dim: int
    potential_fn: Callable[[Array], Array]
    sites: Tuple[SiteSpec, ...] = ()

    def log_prob(self, x: Array) -> Array:
        return -self.potential_fn(x)

    # ---- site packing -------------------------------------------------
    def _offsets(self) -> Sequence[Tuple[SiteSpec, int]]:
        out, off = [], 0
        for s in self.sites:
            out.append((s, off))
            off += s.size
        return out

    def constrain(self, x: Array) -> Mapping[str, Array]:
        """Map a flat unconstrained vector (or batch ``(..., dim)``) to the
        constrained per-site dict (reference ``postprocess_fn`` analog)."""
        out = {}
        for s, off in self._offsets():
            v = x[..., off : off + s.size]
            v = v.reshape(x.shape[:-1] + s.shape) if s.shape else v[..., 0]
            if s.transform == "exp":
                v = jnp.exp(v)
            out[s.name] = v
        return out

    def unconstrain(self, sites: Mapping[str, Array]) -> Array:
        """Inverse of :meth:`constrain` — pack a site dict into a flat
        unconstrained vector (batch dims allowed)."""
        parts = []
        batch = None
        for s, _ in self._offsets():
            v = jnp.asarray(sites[s.name])
            if s.transform == "exp":
                v = jnp.log(v)
            b = v.shape[: v.ndim - len(s.shape)]
            batch = b if batch is None else batch
            parts.append(v.reshape(b + (s.size,)))
        return jnp.concatenate(parts, axis=-1)

    def init_position(self, rng_key: Array, radius: float = 2.0) -> Array:
        """Uniform(-radius, radius) init in unconstrained space — the
        reference's default ``init_to_uniform`` strategy
        (arwmh.py:44, numpyro convention radius=2)."""
        return jax.random.uniform(
            rng_key, (self.dim,), minval=-radius, maxval=radius
        )


# ---------------------------------------------------------------------------
# Shared unconstrained-space log-density building blocks (fp32, NaN-safe).
# ---------------------------------------------------------------------------

_LOG_2 = 0.6931471805599453
_LOG_PI = 1.1447298858494002
_LOG_2PI = 1.8378770664093453


def normal_logpdf(x, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)


def half_cauchy_logpdf(x, scale):
    """log p(x) for x >= 0: 2 / (pi * scale * (1 + (x/scale)^2))."""
    z = x / scale
    return _LOG_2 - _LOG_PI - jnp.log(scale) - jnp.log1p(z * z)


def student_t_logpdf(x, df, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    half = 0.5 * (df + 1.0)
    return (
        jax.lax.lgamma(half)
        - jax.lax.lgamma(0.5 * df)
        - 0.5 * jnp.log(df) - 0.5 * _LOG_PI - jnp.log(scale)
        - half * jnp.log1p(z * z / df)
    )


def folded_student_t_logpdf(x, df, loc=0.0, scale=1.0):
    """log p(|T|) for T ~ StudentT(df, loc, scale), x >= 0."""
    return jnp.logaddexp(
        student_t_logpdf(x, df, loc, scale),
        student_t_logpdf(-x, df, loc, scale),
    )
