from adaptive_mcmc_tpu.parallel.mesh import (  # noqa: F401
    CHAIN_AXIS,
    chain_mesh,
    chain_sharding,
    initialize_distributed,
    replicated,
)
from adaptive_mcmc_tpu.parallel.run import (  # noqa: F401
    cross_chain_moments,
    run_mcmc_sharded,
    sharded_gelman_rubin,
)
