from topotpu.dist.mesh import make_mesh, sharded_interp_tile  # noqa: F401
