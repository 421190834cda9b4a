from topotpu.infill.pipeline import (  # noqa: F401
    infill_network,
    select_predictors,
    InfillResult,
)
