from topotpu.core import constants, dates, grid, config  # noqa: F401
from topotpu.core.dates import DaysMetadata, get_days_metadata  # noqa: F401
from topotpu.core.grid import GridSpec, TileSpec  # noqa: F401
from topotpu.core.config import TopoConfig  # noqa: F401
