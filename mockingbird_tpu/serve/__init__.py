from .http import serve  # noqa: F401
