from africanus_tpu.rime.phase import phase_delay, phase_delay_ri
from africanus_tpu.rime.predict import (
    predict_vis,
    predict_vis_ri,
    apply_gains,
    apply_gains_ri,
)
from africanus_tpu.rime.parangles import parallactic_angles
from africanus_tpu.rime.feeds import feed_rotation, feed_rotation_ri
from africanus_tpu.rime.transform import transform_sources
from africanus_tpu.rime.fast_beam_cubes import (
    beam_cube_dde,
    beam_cube_dde_ri,
    beam_cube_dde_fr_ri,
    freq_grid_interp,
)
from africanus_tpu.rime.zernike import zernike_dde, zernike_dde_ri
from africanus_tpu.rime.wsclean_predict import wsclean_predict, wsclean_predict_ri

__all__ = [
    "phase_delay",
    "phase_delay_ri",
    "predict_vis",
    "predict_vis_ri",
    "apply_gains",
    "apply_gains_ri",
    "parallactic_angles",
    "feed_rotation",
    "feed_rotation_ri",
    "transform_sources",
    "beam_cube_dde",
    "beam_cube_dde_ri",
    "beam_cube_dde_fr_ri",
    "freq_grid_interp",
    "zernike_dde",
    "zernike_dde_ri",
    "wsclean_predict",
    "wsclean_predict_ri",
]
