from topotpu.kernels.wls import batched_wls, batched_gwr_gain  # noqa: F401
from topotpu.kernels.cholesky import ok_solve, OKSolution  # noqa: F401
