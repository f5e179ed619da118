from adaptive_mcmc_tpu.contraction.lipschitz import (  # noqa: F401
    MLPParams,
    apply_lipschitz_mlp,
    compute_kernel_distance,
    compute_kernel_distance_1d,
    compute_wasserstein_contraction,
    init_lipschitz_mlp,
    make_sample_px,
    spectral_norm,
)
