"""Gridding strategy policies, resolved at trace time.

TPU-native equivalents of
``africanus/gridding/perleypolyhedron/policies/``: the reference dispatches
on ``numba.literally`` strings inside the JIT; here policies are plain
Python branches on static strings that select which vectorised expression
is traced — identical capability, zero runtime dispatch.

- baseline transforms (baseline_transform_policies.py): "None", "rotate"
  (facet tangent-plane rotation, Thompson/Moran/Swenson ch. 4), and
  "wlinapprox" (Kogan & Greisen AIPS memo 113 planar w approximation).
  Note: the reference's "rotate" indexes uvw[3] (out of bounds) and chains
  in-place updates; this implementation applies the documented matrix.
- phase transforms (phase_transform_policies.py): "None", "phase_rotate".
- stokes conversions (stokes_conversion_policies.py): the full
  {stokes}_FROM_{corrs} / {corrs}_FROM_{stokes} table.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from africanus_tpu.ops.cplx import Cplx

__all__ = [
    "baseline_transform",
    "phase_transform",
    "corr2stokes",
    "stokes2corr",
    "ncorr_out",
]


def baseline_transform(uvw, ra0, dec0, ra, dec, policy_type):
    """Transform (row, 3) uvw coordinates for faceting."""
    if policy_type == "None":
        return uvw

    d_ra = ra - ra0
    c_d_ra, s_d_ra = np.cos(d_ra), np.sin(d_ra)
    c_new, s_new = np.cos(dec), np.sin(dec)
    c_old, s_old = np.cos(dec0), np.sin(dec0)

    if policy_type == "rotate":
        # elementwise row combinations, not a matmul: TPU dots default
        # to bf16 operands (~0.4% error on |uvw| ~ 1e4 m — multiple
        # cells of pixel offset), and host numpy inputs must stay numpy
        # so pp_tile_plan's f64 tap quantization keeps its precision
        mat = [
            (c_d_ra, s_old * s_d_ra, -c_old * s_d_ra),
            (
                -s_new * s_d_ra,
                s_new * s_old * c_d_ra + c_new * c_old,
                -c_old * s_new * c_d_ra + c_new * s_old,
            ),
            (
                c_new * s_d_ra,
                -c_new * s_old * c_d_ra + s_new * c_old,
                c_new * c_old * c_d_ra + s_new * s_old,
            ),
        ]
        xp = np if isinstance(uvw, np.ndarray) else jnp
        u, v, w = uvw[:, 0], uvw[:, 1], uvw[:, 2]
        return xp.stack(
            [m0 * u + m1 * v + m2 * w for (m0, m1, m2) in mat], axis=1
        )

    if policy_type == "wlinapprox":
        li0 = c_new * s_d_ra
        mi0 = s_new * c_old - c_new * s_old * c_d_ra
        ni0 = s_new * s_old + c_new * c_old * c_d_ra
        u = uvw[:, 0] - uvw[:, 2] * li0 / ni0
        v = uvw[:, 1] - uvw[:, 2] * mi0 / ni0
        return jnp.stack([u, v, uvw[:, 2]], axis=1)

    raise ValueError("unknown baseline transform policy")


def phase_transform(vis: Cplx, uvw, wavelengths, ra0, dec0, ra, dec,
                    policy_type, phasesign=1.0) -> Cplx:
    """Phase-rotate (row, chan, corr) visibilities to the facet centre
    (phase_transform_policies.py:9-34)."""
    if policy_type == "None":
        return vis
    if policy_type != "phase_rotate":
        raise ValueError("Invalid phase transform policy type")

    d_ra = ra - ra0
    c_dec, s_dec = np.cos(dec), np.sin(dec)
    c_dec0, s_dec0 = np.cos(dec0), np.sin(dec0)
    ll = c_dec * np.sin(d_ra)
    mm = s_dec * c_dec0 - c_dec * s_dec0 * np.cos(d_ra)
    nn = -(1.0 - np.sqrt(max(1.0 - ll * ll - mm * mm, 0.0)))

    dot = uvw[:, 0] * ll + uvw[:, 1] * mm + uvw[:, 2] * nn  # (row,)
    x = phasesign * 2.0 * np.pi * dot[:, None] / jnp.asarray(wavelengths)
    cx, sx = jnp.cos(x)[..., None], jnp.sin(x)[..., None]  # (row, chan, 1)
    return Cplx(vis.re * cx - vis.im * sx, vis.re * sx + vis.im * cx)


# {stokes}_FROM_{corr-schema}: (indices, complex weights)
_CORR2STOKES = {
    "I_FROM_XXYY": ((0, 1), (0.5, 0.5)),
    "I_FROM_XXXYYXYY": ((0, 3), (0.5, 0.5)),
    "I_FROM_RRLL": ((0, 1), (0.5, 0.5)),
    "I_FROM_RRRLLRLL": ((0, 3), (0.5, 0.5)),
    "Q_FROM_XXYY": ((0, 1), (0.5, -0.5)),
    "Q_FROM_XXXYYXYY": ((0, 3), (0.5, -0.5)),
    "Q_FROM_RRRLLRLL": ((1, 2), (0.5, 0.5)),
    "U_FROM_XYYX": ((0, 1), (0.5, 0.5)),
    "U_FROM_XXXYYXYY": ((1, 2), (0.5, 0.5)),
    "U_FROM_RLLR": ((0, 1), (-0.5j, 0.5j)),
    "U_FROM_RRRLLRLL": ((1, 2), (-0.5j, 0.5j)),
    "V_FROM_RRLL": ((0, 1), (0.5, -0.5)),
    "V_FROM_RRRLLRLL": ((0, 3), (0.5, -0.5)),
    "V_FROM_XYYX": ((0, 1), (-0.5j, 0.5j)),
    "V_FROM_XXXYYXYY": ((1, 2), (-0.5j, 0.5j)),
}

# {corr-schema}_FROM_{stokes}: per-output-corr weights
_STOKES2CORR = {
    "XXYY_FROM_I": (1.0, 1.0),
    "XXXYYXYY_FROM_I": (1.0, 0.0, 0.0, 1.0),
    "RRLL_FROM_I": (1.0, 1.0),
    "RRRLLRLL_FROM_I": (1.0, 0.0, 0.0, 1.0),
    "XXYY_FROM_Q": (1.0, -1.0),
    "XXXYYXYY_FROM_Q": (1.0, 0.0, 0.0, -1.0),
    "RLLR_FROM_Q": (1.0, 1.0),
    "RRRLLRLL_FROM_Q": (0.0, 1.0, 1.0, 0.0),
    "XYYX_FROM_U": (1.0, 1.0),
    "XXXYYXYY_FROM_U": (0.0, 1.0, 1.0, 0.0),
    "RLLR_FROM_U": (1.0j, -1.0j),
    "RRRLLRLL_FROM_U": (0.0, 1.0j, -1.0j, 0.0),
    "XYYX_FROM_V": (1.0j, -1.0j),
    "XXXYYXYY_FROM_V": (0.0, 1.0j, -1.0j, 0.0),
    "RRLL_FROM_V": (1.0, -1.0),
    "RRRLLRLL_FROM_V": (1.0, 0.0, 0.0, -1.0),
}


def corr2stokes(vis: Cplx, policy_type) -> Cplx:
    """(…, corr) correlations → (…,) stokes scalar."""
    try:
        idx, wgt = _CORR2STOKES[policy_type]
    except KeyError:
        raise ValueError("Invalid stokes mapping for the correlation schema")
    re = 0.0
    im = 0.0
    for i, w in zip(idx, wgt):
        wr, wi = np.real(w), np.imag(w)
        re = re + vis.re[..., i] * wr - vis.im[..., i] * wi
        im = im + vis.re[..., i] * wi + vis.im[..., i] * wr
    return Cplx(re, im)


def stokes2corr(value: Cplx, policy_type) -> Cplx:
    """(…,) stokes scalar → (…, corr) correlations."""
    try:
        wgt = _STOKES2CORR[policy_type]
    except KeyError:
        raise ValueError("Invalid stokes mapping for the correlation schema")
    res, ims = [], []
    for w in wgt:
        wr, wi = np.real(w), np.imag(w)
        res.append(value.re * wr - value.im * wi)
        ims.append(value.re * wi + value.im * wr)
    return Cplx(jnp.stack(res, axis=-1), jnp.stack(ims, axis=-1))


def ncorr_out(policy_type):
    """Number of correlations a stokes2corr policy produces."""
    return len(_STOKES2CORR[policy_type])
