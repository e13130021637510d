from africanus_tpu.model.shape.gaussian_shape import gaussian

__all__ = ["gaussian"]
