from topotpu.utils.status import StatusCheck  # noqa: F401
