from .vector import cosine, dot, l2_norm, to_double_array  # noqa: F401
