from africanus_tpu.rime.phase import phase_delay, phase_delay_ri
from africanus_tpu.rime.predict import (
    predict_vis,
    predict_vis_ri,
    apply_gains,
    apply_gains_ri,
)

__all__ = [
    "phase_delay",
    "phase_delay_ri",
    "predict_vis",
    "predict_vis_ri",
    "apply_gains",
    "apply_gains_ri",
]
