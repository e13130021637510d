"""Explicit shard_map orchestration of the RIME predict / DFT pipelines.

The jnp kernels in this package are sharding-transparent (GSPMD propagates
shardings through them), but explicit ``shard_map`` variants pin the
communication pattern — the TPU-native replacement for the reference's
custom dask HighLevelGraph layers (rime/dask_predict.py LinearReduction:64,
parallel_reduction:311): per-shard source sums stay local; cross-shard
reductions are single psums over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from africanus_tpu.dft.kernels import im_to_vis_ri, vis_to_im_ri
from africanus_tpu.ops.cplx import Cplx, cplx

__all__ = ["sharded_im_to_vis", "sharded_vis_to_im", "sharded_rime_predict"]


def _concrete_freq(frequency):
    """Host copy of ``frequency`` when it is concrete, else None.

    Concrete grids are closed over (not passed as shard_map operands) so
    the fused DFT kernels' rotation-recurrence modes can engage per
    shard (ops/pallas_dft._chan_group_tables needs trace-time values).
    """
    if isinstance(frequency, jax.core.Tracer):
        return None
    import numpy as np

    return np.asarray(frequency)


def sharded_im_to_vis(mesh, image, uvw, lm, frequency, convention="fourier"):
    """im_to_vis with rows sharded over the mesh "row" axis.

    The source contraction is local to each shard — zero communication.
    """
    freq_c = _concrete_freq(frequency)

    def local(img, uvw_s, lm_r, *freq_op):
        freq = freq_c if freq_c is not None else freq_op[0]
        return im_to_vis_ri(img, uvw_s, lm_r, freq, convention)

    extra_in = () if freq_c is not None else (P(),)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("row"), P()) + extra_in,
        out_specs=Cplx(P("row"), P("row")),
        # the TPU route runs the Pallas kernel per shard; pallas outputs
        # carry no varying-mesh-axes annotation
        check_vma=False,
    )
    args = (jnp.asarray(image), jnp.asarray(uvw), jnp.asarray(lm))
    if freq_c is None:
        args += (jnp.asarray(frequency),)
    return fn(*args)


def sharded_vis_to_im(mesh, vis, uvw, lm, frequency, flags, convention="fourier"):
    """vis_to_im with rows sharded: per-shard partial images + one psum —
    the TPU analogue of the reference's dask ``ims.sum(axis=0)``
    row-chunk reduction (dft/dask.py:90)."""
    freq_c = _concrete_freq(frequency)

    def local(vis_s, uvw_s, lm_r, flags_s, *freq_op):
        freq = freq_c if freq_c is not None else freq_op[0]
        im = vis_to_im_ri(vis_s, uvw_s, lm_r, freq, flags_s, convention)
        return jax.lax.psum(im, "row")

    v = cplx(vis)
    extra_in = () if freq_c is not None else (P(),)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(Cplx(P("row"), P("row")), P("row"), P(), P("row"))
        + extra_in,
        out_specs=P(),
        # the TPU route runs the Pallas adjoint kernel per shard; pallas
        # outputs carry no varying-mesh-axes annotation
        check_vma=False,
    )
    args = (v, jnp.asarray(uvw), jnp.asarray(lm), jnp.asarray(flags))
    if freq_c is None:
        args += (jnp.asarray(frequency),)
    return fn(*args)


def sharded_rime_predict(mesh, lm, uvw, frequency, brightness, gauss_shape=None,
                         convention="fourier"):
    """Full per-source RIME predict (K × optional gaussian envelope × B),
    rows sharded over "row" and channels over "chan" when present.

    brightness : (src, chan, corr) (possibly complex / Cplx)
    Returns Cplx (row, chan, corr).
    """
    from africanus_tpu.rime.phase import phase_delay_ri
    from africanus_tpu.model.shape.gaussian_shape import gaussian

    chan_axis = "chan" in mesh.axis_names and mesh.shape["chan"] > 1

    def local(lm_r, uvw_s, freq_s, b: Cplx, gs):
        k = phase_delay_ri(lm_r, uvw_s, freq_s, convention)  # (src,row,chan)
        if gs is not None:
            env = gaussian(uvw_s, freq_s, gs)
            k = Cplx(k.re * env, k.im * env)
        # HIGHEST: default TPU matmuls run at bf16 operand precision,
        # which caps the chain at ~1e-3 relative error
        hp = jax.lax.Precision.HIGHEST
        re = jnp.einsum("srf,sfc->rfc", k.re, b.re, precision=hp) - \
            jnp.einsum("srf,sfc->rfc", k.im, b.im, precision=hp)
        im = jnp.einsum("srf,sfc->rfc", k.re, b.im, precision=hp) + \
            jnp.einsum("srf,sfc->rfc", k.im, b.re, precision=hp)
        return Cplx(re, im)

    b = cplx(brightness)

    chan = "chan" if chan_axis else None
    freq_spec = P(chan)
    bright_spec = Cplx(P(None, chan, None), P(None, chan, None))
    out_spec = Cplx(P("row", chan, None), P("row", chan, None))

    if gauss_shape is None:
        fn = shard_map(
            lambda lm_r, uvw_s, freq_s, bb: local(lm_r, uvw_s, freq_s, bb, None),
            mesh=mesh,
            in_specs=(P(), P("row"), freq_spec, bright_spec),
            out_specs=out_spec,
        )
        return fn(jnp.asarray(lm), jnp.asarray(uvw), jnp.asarray(frequency), b)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("row"), freq_spec, bright_spec, P()),
        out_specs=out_spec,
    )
    return fn(jnp.asarray(lm), jnp.asarray(uvw), jnp.asarray(frequency), b,
              jnp.asarray(gauss_shape))
