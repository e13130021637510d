from africanus_tpu.model.shape.gaussian_shape import gaussian
from africanus_tpu.model.shape.shapelets import (
    shapelet,
    shapelet_1d,
    shapelet_ri,
    shapelet_with_w_term,
    shapelet_with_w_term_ri,
)

__all__ = ["gaussian", "shapelet", "shapelet_1d", "shapelet_ri",
           "shapelet_with_w_term", "shapelet_with_w_term_ri"]
