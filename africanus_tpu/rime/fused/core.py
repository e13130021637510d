"""Fused RIME entry point.

TPU-native equivalent of ``africanus/experimental/rime/fused/core.py``
(rime:233, RimeFactory:127, rime_impl_factory:33) and the argument
resolution of ``arguments.py:44``. Where the reference compiles one numba
kernel by inlining every term's sampler IR into a src/row/chan loop with
Kahan summation (core.py:97-118), here the "compiler" is trace-time
function composition: each term samples the whole (source, row, chan) grid,
the Jones chain is folded with :func:`term_mul` (right terms hermitianed),
and the source axis is summed — XLA fuses the lot. RimeFactory instances
are cached per specification (the reference's Multiton).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from africanus_tpu.ops.cplx import Cplx
from africanus_tpu.rime.fused.specification import RimeSpecification
from africanus_tpu.rime.fused.terms import hermitian, term_mul
from africanus_tpu.rime.fused.transformers import TRANSFORMERS

__all__ = ["rime", "RimeFactory", "consolidate_args"]

REQUIRED_ARGS = ("time", "antenna1", "antenna2", "feed1", "feed2")


def consolidate_args(args, kwargs):
    """Merge mappings/datasets into one kwargs dict (reference core.py:215).

    Accepts dicts and objects with a ``data_vars``-like mapping interface.
    """
    out = {}
    for arg in args:
        if hasattr(arg, "data_vars"):
            for k, v in arg.data_vars.items():
                out[str(k).lower()] = getattr(v, "data", v)
        elif isinstance(arg, dict):
            out.update(arg)
        else:
            raise TypeError(f"Unhandled argument type {type(arg)}")
    out.update(kwargs)
    return out


class RimeFactory:
    """Builds and caches the fused evaluation for one specification."""

    DEFAULT_SPEC = "(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]"

    def __init__(self, rime_spec=None):
        if rime_spec is None:
            rime_spec = RimeSpecification(self.DEFAULT_SPEC)
        elif isinstance(rime_spec, str):
            rime_spec = RimeSpecification(rime_spec)
        self.rime_spec = rime_spec

    def _build_state(self, kwargs):
        """Pack arguments + index arrays + transformer outputs."""
        missing = [a for a in REQUIRED_ARGS[:3] if a not in kwargs]
        if missing:
            raise ValueError(f"Missing required argument(s) {missing}")

        state = dict(kwargs)

        time = np.asarray(kwargs["time"])
        utime, time_inv = np.unique(time, return_inverse=True)
        state["utime"] = jnp.asarray(utime)
        state["time_inverse"] = jnp.asarray(time_inv.astype(np.int32))

        for name in ("antenna1", "antenna2"):
            ant = np.asarray(kwargs[name])
            uant = np.unique(
                np.concatenate(
                    [np.asarray(kwargs["antenna1"]),
                     np.asarray(kwargs["antenna2"])]
                )
            )
            lookup = np.full(int(uant.max()) + 1, -1, np.int32)
            lookup[uant] = np.arange(uant.shape[0], dtype=np.int32)
            state["uantenna"] = jnp.asarray(uant)
            state[f"{name}_inverse"] = jnp.asarray(lookup[ant])

        for name in ("feed1", "feed2"):
            if name in kwargs:
                feed = np.asarray(kwargs[name])
            else:
                feed = np.zeros(time.shape, np.int32)
            ufeed = np.unique(feed)
            lookup = np.full(int(ufeed.max()) + 1, -1, np.int32)
            lookup[ufeed] = np.arange(ufeed.shape[0], dtype=np.int32)
            state["ufeed"] = jnp.asarray(ufeed)
            state[f"{name}_inverse"] = jnp.asarray(lookup[feed])

        # antenna_position may drive the parallactic transformer: the beam/
        # feed tables are indexed by the *inverse* antenna index, so subset
        if "antenna_position" in state:
            ap = np.asarray(state["antenna_position"])
            state["antenna_position"] = ap[np.asarray(state["uantenna"])]

        # run transformers to create missing term inputs
        needed = set()
        for term in self.rime_spec.terms:
            needed.update(term.ARGS)
        for tf in TRANSFORMERS:
            produces = set(tf.OUTPUTS)
            if produces & needed and not produces.issubset(state):
                if tf.can_create(state):
                    state.update(tf.transform(state))
        return state

    def __call__(self, **kwargs):
        """Evaluate the RIME: returns Cplx (row, chan, corr)."""
        state = self._build_state(kwargs)

        for term in self.rime_spec.terms:
            term.validate(state)

        # sample + chain
        chain = None
        for term in self.rime_spec.terms:
            val = term.sample(state)
            if term.configuration == "right":
                val = hermitian(val)
            chain = val if chain is None else term_mul(chain, val)

        ncorr = len(self.rime_spec.corrs)
        if chain.ncorr != ncorr:
            raise ValueError(
                f"Chain produced {chain.ncorr} correlations but the "
                f"specification wants {ncorr}"
            )

        nrow = state["time_inverse"].shape[0]
        nchan = jnp.shape(state["chan_freq"])[0]

        # sum over the source axis of each correlation lane
        outs = []
        for comp in chain.comps:
            re = jnp.broadcast_to(comp.re, (comp.re.shape[0], nrow, nchan))
            im = jnp.broadcast_to(comp.im, (comp.im.shape[0], nrow, nchan))
            outs.append(Cplx(re.sum(axis=0), im.sum(axis=0)))

        out_re = jnp.stack([o.re for o in outs], axis=-1)
        out_im = jnp.stack([o.im for o in outs], axis=-1)
        return Cplx(out_re, out_im)


@lru_cache(maxsize=16)
def _cached_factory(spec_str):
    return RimeFactory(spec_str)


def rime(spec, *args, **kwargs):
    """Evaluate a RIME specification against argument mappings/kwargs
    (reference core.py:233). Returns Cplx (row, chan, corr) — assemble to
    complex on complex-capable backends with
    ``jax.lax.complex(out.re, out.im)``."""
    if isinstance(spec, RimeSpecification):
        factory = RimeFactory(spec)
    else:
        factory = _cached_factory(str(spec))
    merged = consolidate_args(args, kwargs)
    return factory(**merged)
