"""Fused RIME terms.

TPU-native equivalents of ``africanus/experimental/rime/fused/terms/``
(core.py Term:166, phase.py:9, brightness.py, gaussian.py:9,
feed_rotation.py:4, cube_dde.py:19). Where the reference inlines per-sample
numba IR into one kernel (intrinsics.py term_sampler_fn), here each term's
``sample`` returns a whole-grid :class:`TermValue` — a Cplx array
broadcastable to (source, row, chan) with 1/2/4 correlations — and XLA
fuses the chained products. The scalar/diag/full promotion table mirrors
``intrinsics.py:29-95`` (_jones_typ_map), and right-configured terms are
conjugate-transposed exactly as ``intrinsics.py:865-869`` does.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp
from africanus_tpu.ops.cplx import Cplx

__all__ = [
    "TermValue",
    "term_mul",
    "hermitian",
    "Term",
    "Phase",
    "Brightness",
    "Gaussian",
    "FeedRotation",
    "BeamCubeDDE",
]


@dataclass
class TermValue:
    """A sampled term: components broadcastable to (source, row, chan).

    kind: "scalar" (1 corr), "diag" (2), "full" (4, row-major [00,01,10,11]).
    comps: tuple of Cplx, one per correlation lane.
    """

    kind: str
    comps: tuple

    @property
    def ncorr(self):
        return {"scalar": 1, "diag": 2, "full": 4}[self.kind]


def hermitian(v: TermValue) -> TermValue:
    """Conjugate transpose of a term value in its packed representation.

    scalar -> conj; diag -> per-element conj; full 2x2 -> conj with the
    off-diagonal components swapped. The trace-time analogue of the
    reference's LLVM-level hermitian intrinsic
    (``fused/intrinsics.py:70-79``).
    """
    c = v.comps
    if v.kind == "scalar":
        return TermValue("scalar", (c[0].conj(),))
    if v.kind == "diag":
        return TermValue("diag", (c[0].conj(), c[1].conj()))
    return TermValue("full", (c[0].conj(), c[2].conj(), c[1].conj(), c[3].conj()))


def term_mul(a: TermValue, b: TermValue) -> TermValue:
    """Jones product with scalar/diag/full promotion (intrinsics.py:114)."""
    ac, bc = a.comps, b.comps
    key = (a.kind, b.kind)
    if key == ("scalar", "scalar"):
        return TermValue("scalar", (ac[0] * bc[0],))
    if key == ("scalar", "diag"):
        return TermValue("diag", (ac[0] * bc[0], ac[0] * bc[1]))
    if key == ("diag", "scalar"):
        return TermValue("diag", (ac[0] * bc[0], ac[1] * bc[0]))
    if key == ("scalar", "full"):
        return TermValue("full", tuple(ac[0] * x for x in bc))
    if key == ("full", "scalar"):
        return TermValue("full", tuple(x * bc[0] for x in ac))
    if key == ("diag", "diag"):
        return TermValue("diag", (ac[0] * bc[0], ac[1] * bc[1]))
    if key == ("diag", "full"):
        return TermValue(
            "full",
            (ac[0] * bc[0], ac[0] * bc[1], ac[1] * bc[2], ac[1] * bc[3]),
        )
    if key == ("full", "diag"):
        return TermValue(
            "full",
            (ac[0] * bc[0], ac[1] * bc[1], ac[2] * bc[0], ac[3] * bc[1]),
        )
    # full x full: 2x2 matmul on [00, 01, 10, 11]
    return TermValue(
        "full",
        (
            ac[0] * bc[0] + ac[1] * bc[2],
            ac[0] * bc[1] + ac[1] * bc[3],
            ac[2] * bc[0] + ac[3] * bc[2],
            ac[2] * bc[1] + ac[3] * bc[3],
        ),
    )


class Term:
    """Base class. Subclasses define ARGS/KWARGS (argument names pulled
    from the user's kwargs) and implement ``sample(state) -> TermValue``.
    ``configuration`` is "left"/"middle"/"right" from the spec string.

    ``SOURCE_ARGS`` names the subset of ARGS/KWARGS indexed by source on
    their leading axis — the fused core slices exactly these when
    evaluating in source blocks (``rime(..., source_block=N)``). Leave it
    ``None`` (the default) to let the core infer them by matching each
    argument's leading dimension against the source count.
    """

    ARGS: tuple = ()
    KWARGS: dict = {}
    SOURCE_ARGS: tuple | None = None

    def __init__(self, configuration: str = "middle"):
        self.configuration = configuration

    def validate(self, kwargs):
        missing = [a for a in self.ARGS if a not in kwargs]
        if missing:
            raise ValueError(
                f"{type(self).__name__} requires argument(s) {missing}"
            )

    def sample(self, state) -> TermValue:
        raise NotImplementedError


def _bcast3(x):
    """Cplx broadcast helper: returns components shaped (src, row, chan)
    compatible via numpy broadcasting rules."""
    return x


class Phase(Term):
    """Phase Delay Term (terms/phase.py:9): e^{C·(ul+vm+(n−1)w)·ν}."""

    ARGS = ("lm", "uvw", "chan_freq")
    SOURCE_ARGS = ("lm",)
    KWARGS = {"convention": "fourier"}

    def sample(self, state) -> TermValue:
        from africanus_tpu.rime.phase import phase_delay_ri

        k = phase_delay_ri(
            state["lm"], state["uvw"], state["chan_freq"],
            convention=state.get("convention", "fourier"),
        )
        return TermValue("scalar", (k,))


# stokes -> correlation linear combinations (terms/brightness.py:11-21)
_STOKES_CONV = {
    "XX": (("I", 1.0), ("Q", 1.0)),
    "XY": (("U", 1.0), ("V", 1.0j)),
    "YX": (("U", 1.0), ("V", -1.0j)),
    "YY": (("I", 1.0), ("Q", -1.0)),
    "RR": (("I", 1.0), ("V", 1.0)),
    "RL": (("Q", 1.0), ("U", 1.0j)),
    "LR": (("Q", 1.0), ("U", -1.0j)),
    "LL": (("I", 1.0), ("V", -1.0)),
}


class Brightness(Term):
    """Brightness Term (terms/brightness.py): spectral model + stokes→corr."""

    ARGS = ("stokes", "chan_freq")
    SOURCE_ARGS = ("stokes", "spi", "ref_freq")
    KWARGS = {"spi": None, "ref_freq": None, "spi_base": "standard"}

    def __init__(self, configuration, stokes, corrs):
        super().__init__(configuration)
        self.stokes_schema = stokes
        self.corr_schema = corrs

    def sample(self, state) -> TermValue:
        stokes = state["stokes"]  # (source, nstokes)
        freq = state["chan_freq"]
        spi = state.get("spi")
        ref_freq = state.get("ref_freq")
        base = state.get("spi_base", "standard")

        nsrc = stokes.shape[0]
        nchan = freq.shape[0]

        # per-stokes spectral model (source, chan, nstokes) — the
        # shared three-base implementation (model/spectral/spec_model.py)
        if spi is not None and ref_freq is not None:
            from africanus_tpu.model.spectral import spectral_model

            spec = spectral_model(
                stokes, jnp.asarray(spi), jnp.asarray(ref_freq), freq,
                base={"standard": "std"}.get(base, base),
            )
        else:
            spec = jnp.broadcast_to(
                stokes[:, None, :], (nsrc, nchan, stokes.shape[1])
            )

        sidx = {s: i for i, s in enumerate(self.stokes_schema)}
        comps = []
        for corr in self.corr_schema:
            try:
                conv = _STOKES_CONV[corr]
            except KeyError:
                raise ValueError(f"No conversion for correlation {corr}")
            re = 0.0
            im = 0.0
            for stokes_name, wgt in conv:
                if stokes_name not in sidx:
                    raise ValueError(
                        f"{corr} requires stokes parameter {stokes_name} "
                        f"but only {self.stokes_schema} are available"
                    )
                term = spec[:, None, :, sidx[stokes_name]]  # (src, 1, chan)
                re = re + term * np.real(wgt)
                im = im + term * np.imag(wgt)
            comps.append(Cplx(re, im))

        kind = {1: "scalar", 2: "diag", 4: "full"}[len(comps)]
        return TermValue(kind, tuple(comps))


class Gaussian(Term):
    """Gaussian shape envelope term (scalar amplitude per
    (src, row, chan)) driven by ``gauss_shape`` (emaj, emin, angle);
    reference ``fused/terms/gaussian.py:9``."""

    ARGS = ("uvw", "chan_freq", "gauss_shape")
    SOURCE_ARGS = ("gauss_shape",)

    def sample(self, state) -> TermValue:
        from africanus_tpu.model.shape.gaussian_shape import gaussian

        env = gaussian(state["uvw"], state["chan_freq"],
                       state["gauss_shape"])
        return TermValue("scalar", (Cplx(env, jnp.zeros_like(env)),))


class FeedRotation(Term):
    """Feed rotation term (terms/feed_rotation.py:4). Samples the per-row
    antenna's feed angles from the transformer-supplied ``feed_parangle``
    table of shape (utime, feed, ant, 2, 2) holding [[sin a, cos a],
    [sin b, cos b]] for the two receptors."""

    ARGS = ("feed_parangle",)
    SOURCE_ARGS = ()

    def __init__(self, configuration, feed_type, corrs):
        if configuration not in {"left", "right"}:
            raise ValueError(
                f"FeedRotation configuration placement must be 'left' or "
                f"'right'. Got {configuration}"
            )
        if feed_type not in {"linear", "circular"}:
            raise ValueError(
                f"FeedRotation feed_type must be 'linear' or "
                f"'circular'. Got {feed_type}"
            )
        if len(corrs) != 4:
            raise ValueError(
                f"feed rotation needs 4 correlations; got "
                f"{corrs} were specified"
            )
        super().__init__(configuration)
        self.feed_type = feed_type

    def sample(self, state) -> TermValue:
        left = self.configuration == "left"
        pa = state["feed_parangle"]  # (utime, feed, ant, 2, 2)
        t = state["time_inverse"]
        a = state["antenna1_inverse"] if left else state["antenna2_inverse"]
        f = state["feed1_inverse"] if left else state["feed2_inverse"]

        sin_a = pa[t, f, a, 0, 0][None, :, None]  # (1, row, 1)
        cos_a = pa[t, f, a, 0, 1][None, :, None]
        sin_b = pa[t, f, a, 1, 0][None, :, None]
        cos_b = pa[t, f, a, 1, 1][None, :, None]
        zero = jnp.zeros_like(sin_a)

        if self.feed_type == "linear":
            comps = (
                Cplx(cos_a, zero),
                Cplx(sin_a, zero),
                Cplx(-sin_b, zero),
                Cplx(cos_b, zero),
            )
        else:
            comps = (
                Cplx(0.5 * (cos_a + cos_b), -0.5 * (sin_a + sin_b)),
                Cplx(0.5 * (cos_a - cos_b), 0.5 * (sin_a - sin_b)),
                Cplx(0.5 * (cos_a - cos_b), -0.5 * (sin_a - sin_b)),
                Cplx(0.5 * (cos_a + cos_b), 0.5 * (sin_a + sin_b)),
            )
        return TermValue("full", comps)


class BeamCubeDDE(Term):
    """Beam cube DDE term (terms/cube_dde.py:19): trilinear interpolation
    of the FITS beam cube at each source's rotated/scaled position,
    gathered to rows via the time/antenna inverse indices."""

    ARGS = ("beam", "beam_lm_extents", "beam_freq_map", "lm", "chan_freq")
    SOURCE_ARGS = ("lm",)
    KWARGS = {
        "beam_parangle": None,
        "beam_point_errors": None,
        "beam_antenna_scaling": None,
    }

    def __init__(self, configuration, corrs):
        if configuration not in {"left", "right"}:
            raise ValueError(
                f"BeamCubeDDE configuration placement must be 'left' or "
                f"'right'. Got {configuration}"
            )
        super().__init__(configuration)
        self.corrs = corrs

    def sample(self, state) -> TermValue:
        from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri
        from africanus_tpu.ops.cplx import cplx as as_cplx

        beam = as_cplx(state["beam"])
        lm = state["lm"]
        freq = state["chan_freq"]
        utime = state["utime"]
        uantenna = state["uantenna"]
        nutime = utime.shape[0]
        nant = uantenna.shape[0]
        nchan = freq.shape[0]

        pa = state.get("beam_parangle")
        if pa is None:
            pa = jnp.zeros((nutime, nant))
        pe = state.get("beam_point_errors")
        if pe is None:
            pe = jnp.zeros((nutime, nant, nchan, 2))
        ascale = state.get("beam_antenna_scaling")
        if ascale is None:
            ascale = jnp.ones((nant, nchan, 2))

        sampled = beam_cube_dde_ri(
            beam,
            state["beam_lm_extents"],
            state["beam_freq_map"],
            lm,
            pa,
            pe,
            ascale,
            freq,
        )  # (src, utime, ant, chan, corr…)

        t = state["time_inverse"]
        left = self.configuration == "left"
        a = state["antenna1_inverse"] if left else state["antenna2_inverse"]
        rows = sampled[:, t, a]  # (src, row, chan, corr…)

        ncorr = int(np.prod(rows.shape[3:]))
        flat = rows.reshape(rows.shape[:3] + (ncorr,))
        comps = tuple(
            Cplx(flat.re[..., i], flat.im[..., i]) for i in range(ncorr)
        )
        kind = {1: "scalar", 2: "diag", 4: "full"}[ncorr]
        return TermValue(kind, comps)
