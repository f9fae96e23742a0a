from . import drr, fd, resample  # noqa: F401
