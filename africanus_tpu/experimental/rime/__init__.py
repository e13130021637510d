from africanus_tpu.rime import fused  # noqa: F401
