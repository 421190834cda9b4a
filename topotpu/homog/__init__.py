from topotpu.homog.pha import homogenize_network, HomogResult  # noqa: F401
