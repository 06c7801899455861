from . import hashing, safe_math, text, vector  # noqa: F401
