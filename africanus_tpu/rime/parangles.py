"""Parallactic angles per (time, antenna).

TPU-native equivalent of reference ``africanus/rime/parangles.py:21`` with
its casacore backend (``parangles_casa.py:24``) replaced by a pure-JAX
astrometric implementation (:mod:`africanus_tpu.utils.astrometry`) — fully
jittable, no measures server, no thread-local state, no process pool.

Backends
--------
- ``"jax"`` (default): GAST + IAU-1976 precession + dominant nutation;
  agrees with casacore AZEL posangle to the ~arcsecond level dominated by
  neglected aberration/polar-motion terms (the reference flags its own
  astropy backend as returning *incorrect* values, parangles.py:61).
- ``"test"``: times[:, None] * antenna_positions.sum(axis=1)[None, :] —
  the reference's deterministic test backend (parangles.py:66).
"""

from __future__ import annotations

import jax.numpy as jnp

from africanus_tpu.utils.astrometry import (
    gast_from_mjd_seconds,
    itrf_to_geodetic,
    parallactic_angle,
    precess_j2000_to_date,
)

__all__ = ["parallactic_angles"]

_STANDARD_BACKENDS = {"jax", "numpy", "test"}


def parallactic_angles(times, antenna_positions, field_centre,
                       backend="numpy"):
    """Compute parallactic angles for each timestep and antenna.

    Parameters
    ----------
    times : (time,) array — UTC Mean Julian Date times in *seconds*.
    antenna_positions : (ant, 3) array — ITRF positions in metres.
    field_centre : (2,) array — J2000 (ra, dec) in radians.
    backend : {"numpy", "jax", "test"}
        "numpy" (the default) computes on the host in exact float64 —
        MJD *seconds* (~5e9) lose ~512 s (~2° of Earth rotation) to f32
        rounding, so this is the only safe choice on float32-only
        devices (and matches the reference's host casacore path,
        parangles.py:21). "jax" is jittable; it warns when the working
        dtype cannot hold MJD seconds.

    Returns
    -------
    (time, ant) array of parallactic angles in radians.
    """
    if backend not in _STANDARD_BACKENDS:
        raise ValueError(
            f"'{backend}' is not one of the standard backends "
            f"'{sorted(_STANDARD_BACKENDS)}'"
        )

    import numpy as _np

    xp = _np if backend == "numpy" else jnp

    if xp is _np:
        times = _np.asarray(times, dtype=_np.float64)
    else:
        times = jnp.asarray(times)
        if times.dtype != jnp.float64:
            import warnings

            warnings.warn(
                "parallactic_angles(backend='jax') at "
                f"{times.dtype}: MJD seconds (~5e9) lose ~512 s to f32 "
                "rounding (~2 deg of Earth rotation); use the default "
                "backend='numpy' host float64 path on f32-only devices",
                stacklevel=2,
            )
    antenna_positions = xp.asarray(antenna_positions)
    field_centre = xp.asarray(field_centre)

    if field_centre.shape != (2,):
        raise ValueError(f"Invalid field_centre shape {field_centre.shape}")

    if backend == "test":
        return times[:, None] * antenna_positions.sum(axis=1)[None, :]

    lon, lat, _ = itrf_to_geodetic(antenna_positions, xp)  # (ant,)

    # Apparent place of the field centre at each time
    ra_app, dec_app = precess_j2000_to_date(
        field_centre[0], field_centre[1], times, xp
    )  # (time,)

    # Local apparent sidereal time per (time, ant); hour angle
    last = gast_from_mjd_seconds(times, xp)[:, None] + lon[None, :]
    ha = last - ra_app[:, None]

    return parallactic_angle(ha, dec_app[:, None], lat[None, :], xp)
