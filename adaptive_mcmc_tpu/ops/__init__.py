from adaptive_mcmc_tpu.ops.cholesky import (  # noqa: F401
    adaptive_scale_update,
    rank1_cholesky_update,
    rank1_cholesky_update_batched,
)
