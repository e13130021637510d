from africanus_tpu.gridding.wgridder.api import dirty, model, residual, hessian
from africanus_tpu.gridding.wgridder.core import grid_adjoint, degrid

__all__ = ["dirty", "model", "residual", "hessian", "grid_adjoint", "degrid"]
