"""Fused RIME transformers: derive missing term inputs from other columns.

Equivalent of ``africanus/experimental/rime/fused/transformers/`` —
LMTransformer (lm.py:8: radec + phase_dir → lm) and
ParallacticTransformer (parangle.py:10: times + antenna positions +
phase_dir → beam/feed parallactic angles). The reference isolates casacore
in a process pool because it is not thread-safe; our astrometry is pure
numpy/JAX (utils/astrometry.py), so transformers are plain functions run
at state-build time.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["LMTransformer", "ParallacticTransformer", "TRANSFORMERS"]


class Transformer:
    OUTPUTS = ()
    ARGS = ()

    def can_create(self, available):
        return all(a in available for a in self.ARGS)

    def transform(self, state):
        raise NotImplementedError


class LMTransformer(Transformer):
    """radec + phase_dir → lm (transformers/lm.py:8)."""

    OUTPUTS = ("lm",)
    ARGS = ("radec", "phase_dir")

    def transform(self, state):
        from africanus_tpu.coordinates import radec_to_lm

        return {"lm": radec_to_lm(state["radec"], state["phase_dir"])}


class ParallacticTransformer(Transformer):
    """utime + antenna_position + phase_dir → beam_parangle (utime, ant)
    and feed_parangle (utime, feed, ant, 2, 2) sin/cos tables
    (transformers/parangle.py:10). Receptor angles default to zero;
    ``receptor_angle`` of shape (ant, 2) offsets the two receptors."""

    OUTPUTS = ("beam_parangle", "feed_parangle")
    ARGS = ("utime", "antenna_position", "phase_dir")

    def transform(self, state):
        from africanus_tpu.rime.parangles import parallactic_angles

        utime = np.asarray(state["utime"])
        antpos = np.asarray(state["antenna_position"])
        phase_dir = np.asarray(state["phase_dir"])

        pa = parallactic_angles(utime, antpos, phase_dir, backend="numpy")
        nutime, nant = pa.shape
        nfeed = state["ufeed"].shape[0] if "ufeed" in state else 1

        ra = state.get("receptor_angle")
        if ra is None:
            ra = np.zeros((nant, 2))
        else:
            ra = np.asarray(ra)

        # (utime, 1, ant): one angle table broadcast over feeds
        ang_a = pa[:, None, :] + ra[None, None, :, 0]
        ang_b = pa[:, None, :] + ra[None, None, :, 1]
        feed_pa = np.stack(
            [
                np.stack([np.sin(ang_a), np.cos(ang_a)], axis=-1),
                np.stack([np.sin(ang_b), np.cos(ang_b)], axis=-1),
            ],
            axis=-2,
        )  # (utime, 1, ant, 2, 2)
        feed_pa = np.broadcast_to(
            feed_pa, (nutime, nfeed, nant, 2, 2)
        ).copy()

        return {
            "beam_parangle": jnp.asarray(pa),
            "feed_parangle": jnp.asarray(feed_pa),
        }


TRANSFORMERS = (LMTransformer(), ParallacticTransformer())
