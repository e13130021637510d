from africanus_tpu.gridding.perleypolyhedron.gridder import (
    gridder,
    degridder,
    degridder_serial,
)
from africanus_tpu.gridding.perleypolyhedron import kernels, policies

__all__ = ["gridder", "degridder", "degridder_serial", "kernels", "policies"]
