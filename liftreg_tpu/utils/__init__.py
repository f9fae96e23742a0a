from .config import ParameterDict  # noqa: F401
