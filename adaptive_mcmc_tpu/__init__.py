"""adaptive_mcmc_tpu — a TPU-native adaptive-MCMC framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``savelovme/adaptive-mcmc`` research codebase (adaptive random-walk
Metropolis-Hastings, adaptive stereographic slice sampling, NUTS baselines,
Wasserstein/MMD sample-quality metrics, and Lipschitz-NN estimators of
transition-kernel contraction coefficients), built TPU-first:

* kernels are pure ``(state) -> state`` functions over *flat* vector states
  (static shapes, no per-step pytree flattening), composed into a single
  fused ``lax.scan`` body;
* chains are a leading batch axis so thousands of chains run in one XLA
  program per chip;
* devices are a ``jax.sharding.Mesh`` axis (``shard_map``), with XLA
  collectives only at diagnostic boundaries (R-hat / ESS / pooled metrics) —
  chains are embarrassingly parallel across ICI;
* the O(d^2)-sequential rank-1 Cholesky update of the covariance adaptation
  has a Pallas TPU kernel (chains on lanes) next to a pure-XLA reference
  implementation;
* everything is self-contained: no NumPyro, no OTT — the PPL layer of the
  reference is replaced by hand-written unconstrained-space log-densities
  (``models/``), the MCMC driver by a scan runner (``infer/``), and the
  Sinkhorn/assignment solvers by in-repo JAX + native C++ implementations
  (``metrics/``, ``_native/``).

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

from adaptive_mcmc_tpu import kernels  # noqa: F401  (registers factories)
from adaptive_mcmc_tpu.models import (  # noqa: F401
    Target,
    diamonds,
    eight_schools_centered,
    eight_schools_noncentered,
    gaussian_mixture_1d,
    kidiq,
    mvn,
    std_normal,
)
from adaptive_mcmc_tpu.kernels import (  # noqa: F401
    ARWMHAdaptState,
    ARWMHConfig,
    ARWMHState,
    ASSSAdaptState,
    ASSSConfig,
    ASSSState,
    NUTSConfig,
    NUTSState,
    SAConfig,
    SAState,
    arwmh,
    asss,
    nuts,
    rwm,
    sa,
)
from adaptive_mcmc_tpu.infer import (  # noqa: F401
    MCMC,
    collect_states_logscale,
    get_init_adapt_state,
    ns_logscale,
    run_mcmc,
    sample_pnx,
)
