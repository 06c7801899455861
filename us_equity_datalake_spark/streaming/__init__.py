from . import jobs, windows  # noqa: F401
