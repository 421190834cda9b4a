from topotpu.geo.distance import great_circle_km, pairwise_great_circle_km  # noqa: F401
from topotpu.geo.neighbors import (  # noqa: F401
    Neighborhood,
    select_neighbors,
    distance_weights,
)
from topotpu.geo.regions import make_climate_regions  # noqa: F401
