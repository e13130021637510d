from africanus_tpu.calibration.utils import (
    DIAG_DIAG,
    DIAG,
    FULL,
    check_type,
    chunkify_rows,
    corrupt_vis,
    corrupt_vis_ri,
    correct_vis,
    correct_vis_ri,
    residual_vis,
    residual_vis_ri,
    compute_and_corrupt_vis,
    compute_and_corrupt_vis_ri,
)
from africanus_tpu.calibration.phase_only import (
    compute_jhj,
    compute_jhr,
    compute_jhj_and_jhr,
    gauss_newton,
    gauss_newton_ri,
)

__all__ = [
    "DIAG_DIAG", "DIAG", "FULL", "check_type", "chunkify_rows",
    "corrupt_vis", "corrupt_vis_ri", "correct_vis", "correct_vis_ri",
    "residual_vis", "residual_vis_ri",
    "compute_and_corrupt_vis", "compute_and_corrupt_vis_ri",
    "compute_jhj", "compute_jhr", "compute_jhj_and_jhr",
    "gauss_newton", "gauss_newton_ri",
]
