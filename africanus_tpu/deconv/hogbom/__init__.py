from africanus_tpu.deconv.hogbom.clean import (
    hogbom_clean,
    find_peak,
    fit_2d_gaussian,
    restore,
)

__all__ = ["hogbom_clean", "find_peak", "fit_2d_gaussian", "restore"]
