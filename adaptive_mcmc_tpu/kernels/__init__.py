from adaptive_mcmc_tpu.kernels.base import Kernel  # noqa: F401
from adaptive_mcmc_tpu.kernels.arwmh import (  # noqa: F401
    ARWMHAdaptState,
    ARWMHConfig,
    ARWMHState,
    arwmh,
    rwm,
)
from adaptive_mcmc_tpu.kernels.asss import (  # noqa: F401
    ASSSAdaptState,
    ASSSConfig,
    ASSSState,
    asss,
)
from adaptive_mcmc_tpu.kernels.nuts import (  # noqa: F401
    NUTSConfig,
    NUTSState,
    nuts,
)
from adaptive_mcmc_tpu.kernels.sa import (  # noqa: F401
    SAConfig,
    SAState,
    sa,
)

from adaptive_mcmc_tpu.infer.mcmc import register_kernel_factory

register_kernel_factory("arwmh", arwmh)
register_kernel_factory("asss", asss)
register_kernel_factory("nuts", nuts)
register_kernel_factory("sa", sa)
