"""Public w-gridder API: dirty / model / residual / hessian.

Reference-parity wrappers (``africanus/gridding/wgridder/vis2im.py:78``,
``im2vis.py:65``, ``im2residim.py:87``, ``hessian.py:85``) around the
TPU-native gridder core: per-imaging-band loops over
``freq_bin_idx``/``freq_bin_counts``, with the ducc0 nthreads knob accepted
(and ignored — parallelism is XLA's). ``double_accum`` forces float64
accumulation (ducc0's double_precision_accumulation); it needs an
x64-capable backend and raises on this float64-less TPU rather than
silently accumulating in float32.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from africanus_tpu.gridding.wgridder.core import (
    degrid,
    grid_adjoint,
    make_plan,
)

__all__ = ["dirty", "model", "residual", "hessian"]


def _bands(freq_bin_idx, freq_bin_counts):
    idx = np.asarray(freq_bin_idx)
    counts = np.asarray(freq_bin_counts)
    idx = idx - idx.min()
    return [slice(int(i), int(i + c)) for i, c in zip(idx, counts)]


def dirty(
    uvw,
    freq,
    vis,
    freq_bin_idx,
    freq_bin_counts,
    nx,
    ny,
    cell,
    weights=None,
    flag=None,
    celly=None,
    epsilon=1e-5,
    nthreads=1,
    do_wstacking=True,
    double_accum=False,
):
    """Visibilities → per-band dirty images of shape (nband, nx, ny)."""
    celly = cell if celly is None else celly
    vis = jnp.asarray(vis)
    uvw = np.asarray(uvw)
    freq = np.asarray(freq)

    out = []
    for band in _bands(freq_bin_idx, freq_bin_counts):
        wgt = None if weights is None else jnp.asarray(weights)[:, band]
        msk = None if flag is None else jnp.asarray(flag)[:, band]
        out.append(
            grid_adjoint(
                uvw, freq[band], vis[:, band], wgt, nx, ny, cell, celly,
                epsilon, do_wstacking, mask=msk, double_accum=double_accum,
            )
        )
    return jnp.stack(out, axis=0)


def model(
    uvw,
    freq,
    image,
    freq_bin_idx,
    freq_bin_counts,
    cell,
    weights=None,
    flag=None,
    celly=None,
    epsilon=1e-5,
    nthreads=1,
    do_wstacking=True,
):
    """Per-band image (nband, nx, ny) → model visibilities (row, chan)."""
    celly = cell if celly is None else celly
    image = jnp.asarray(image)
    uvw = np.asarray(uvw)
    freq = np.asarray(freq)

    cols = []
    for b, band in enumerate(_bands(freq_bin_idx, freq_bin_counts)):
        wgt = None if weights is None else jnp.asarray(weights)[:, band]
        msk = None if flag is None else jnp.asarray(flag)[:, band]
        cols.append(
            degrid(uvw, freq[band], image[b], wgt, cell, celly, epsilon,
                   do_wstacking, mask=msk)
        )
    return jnp.concatenate(cols, axis=1)


def residual(
    uvw,
    freq,
    image,
    vis,
    freq_bin_idx,
    freq_bin_counts,
    cell,
    weights=None,
    flag=None,
    celly=None,
    epsilon=1e-5,
    nthreads=1,
    do_wstacking=True,
    double_accum=False,
):
    """Image-plane residual: dirty(vis − degrid(image)) per band
    (reference im2residim.py:50-75, computed without the extra FFT
    round-trip a dirty-of-residual-image would need)."""
    celly = cell if celly is None else celly
    vis = jnp.asarray(vis)
    image = jnp.asarray(image)
    uvw = np.asarray(uvw)
    freq = np.asarray(freq)

    out = []
    for b, band in enumerate(_bands(freq_bin_idx, freq_bin_counts)):
        wgt = None if weights is None else jnp.asarray(weights)[:, band]
        msk = None if flag is None else jnp.asarray(flag)[:, band]
        # one shared plan (incl. tile plan on TPU) for both directions
        plan = make_plan(uvw, freq[band], image.shape[1], image.shape[2],
                         cell, celly, epsilon, do_wstacking)
        mvis = degrid(uvw, freq[band], image[b], None, cell, celly, epsilon,
                      do_wstacking, plan=plan)
        rvis = vis[:, band] - mvis
        out.append(
            grid_adjoint(uvw, freq[band], rvis, wgt,
                         image.shape[1], image.shape[2], cell, celly,
                         epsilon, do_wstacking, mask=msk, plan=plan,
                         double_accum=double_accum)
        )
    return jnp.stack(out, axis=0)


def hessian(
    uvw,
    freq,
    image,
    freq_bin_idx,
    freq_bin_counts,
    cell,
    weights=None,
    flag=None,
    celly=None,
    epsilon=1e-5,
    nthreads=1,
    do_wstacking=True,
    double_accum=False,
):
    """Apply the imaging Hessian: grid(degrid(image)) per band
    (reference hessian.py:48-75)."""
    celly = cell if celly is None else celly
    image = jnp.asarray(image)
    uvw = np.asarray(uvw)
    freq = np.asarray(freq)

    out = []
    for b, band in enumerate(_bands(freq_bin_idx, freq_bin_counts)):
        wgt = None if weights is None else jnp.asarray(weights)[:, band]
        msk = None if flag is None else jnp.asarray(flag)[:, band]
        plan = make_plan(uvw, freq[band], image.shape[1], image.shape[2],
                         cell, celly, epsilon, do_wstacking)
        mvis = degrid(uvw, freq[band], image[b], wgt, cell, celly, epsilon,
                      do_wstacking, mask=msk, plan=plan)
        out.append(
            grid_adjoint(uvw, freq[band], mvis, wgt,
                         image.shape[1], image.shape[2], cell, celly,
                         epsilon, do_wstacking, mask=msk, plan=plan,
                         double_accum=double_accum)
        )
    return jnp.stack(out, axis=0)
