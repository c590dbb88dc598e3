from . import distance, hashing, text  # noqa: F401
