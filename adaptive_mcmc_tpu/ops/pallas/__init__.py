from adaptive_mcmc_tpu.ops.pallas.chol_update import (  # noqa: F401
    chol_update_pallas,
)
