from .precision import matmul_precision, set_matmul_precision  # noqa: F401
