from topotpu.homog.pha import (  # noqa: F401
    HomogResult,
    homogenize_elements,
    homogenize_network,
    parse_station_history,
)
