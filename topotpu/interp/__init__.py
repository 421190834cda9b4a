from topotpu.interp.normals import krig_normals, NormalsResult  # noqa: F401
from topotpu.interp.anoms import anomaly_gain_rows, scatter_gains  # noqa: F401
from topotpu.interp.point import interp_tile, TileInputs, TileResult  # noqa: F401
