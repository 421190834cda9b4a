from topotpu.dist.mesh import make_mesh, sharded_interp_tile  # noqa: F401
from topotpu.dist.engine import TileEngine, TileTask, StationSet  # noqa: F401
