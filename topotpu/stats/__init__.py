from topotpu.stats.variogram import (  # noqa: F401
    exp_variogram,
    exp_covariance,
    empirical_variogram,
    fit_exp_variogram,
    VariogramFit,
)
