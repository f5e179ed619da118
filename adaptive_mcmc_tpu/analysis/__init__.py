from adaptive_mcmc_tpu.analysis.invariance import (  # noqa: F401
    invariance_ks,
    ks_null_threshold,
    ks_statistic,
    push_through_kernel,
)
from adaptive_mcmc_tpu.analysis.contraction_curves import (  # noqa: F401
    contraction_decay_curve,
    taus_finite_difference,
)
from adaptive_mcmc_tpu.analysis.posterior import (  # noqa: F401
    functional_convergence,
    pe_offset,
    posterior_predictive,
)
