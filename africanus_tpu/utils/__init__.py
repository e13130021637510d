from africanus_tpu.utils.types import complex_dtype_for, real_dtype_for

__all__ = ["complex_dtype_for", "real_dtype_for"]
