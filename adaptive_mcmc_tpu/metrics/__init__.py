from adaptive_mcmc_tpu.metrics.moments import pth_moment_rmse  # noqa: F401
from adaptive_mcmc_tpu.metrics.sliced import (  # noqa: F401
    max_sliced_wasserstein,
    sliced_wasserstein,
    wasserstein_1d,
)
from adaptive_mcmc_tpu.metrics.mmd import (  # noqa: F401
    gaussian_kernel,
    median_sq_dist,
    mmd2_unbiased,
    mmd_heuristic,
    mmd_heuristic_many,
)
from adaptive_mcmc_tpu.metrics.sinkhorn import (  # noqa: F401
    wasserstein_sinkhorn,
    wasserstein_sinkhorn_unbiased,
)
from adaptive_mcmc_tpu.metrics.wasserstein import (  # noqa: F401
    minkowski_cost_matrix,
    wasserstein_dist11_p,
)
from adaptive_mcmc_tpu.metrics.assignment import (  # noqa: F401
    auction_assignment,
    linear_sum_assignment,
)
