"""Fused RIME vs the unfused API composition — the reference's own oracle
strategy (experimental/rime/fused/tests/test_rime.py imports
phase_delay/spectral_model/convert as the oracle)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.ops.cplx import to_numpy
from africanus_tpu.rime.fused import (
    RimeFactory,
    RimeParseError,
    RimeSpecification,
    rime,
)
from africanus_tpu.rime import phase_delay, feed_rotation, parallactic_angles
from africanus_tpu.model.spectral import spectral_model
from africanus_tpu.model.coherency import convert
from africanus_tpu.model.shape import gaussian


@pytest.fixture
def obs(rng, wsrt_ants):
    nsrc, ntime, nchan = 5, 3, 4
    nant = wsrt_ants.shape[0]
    a1, a2 = np.triu_indices(nant, 1)
    antenna1 = np.tile(a1, ntime)
    antenna2 = np.tile(a2, ntime)
    time = np.repeat(5.03e9 + np.arange(ntime) * 8.0, a1.size)
    nrow = time.shape[0]
    return dict(
        time=time,
        antenna1=antenna1,
        antenna2=antenna2,
        feed1=np.zeros(nrow, np.int32),
        feed2=np.zeros(nrow, np.int32),
        radec=rng.uniform(-0.01, 0.01, (nsrc, 2)) + np.array([0.2, -0.6]),
        phase_dir=np.array([0.2, -0.6]),
        uvw=rng.uniform(-1000, 1000, (nrow, 3)),
        chan_freq=np.linspace(0.856e9, 1.712e9, nchan),
        stokes=rng.uniform(0.5, 2.0, (nsrc, 4)),
        spi=rng.normal(scale=0.2, size=(nsrc, 2, 4)),
        ref_freq=np.full(nsrc, 1.2e9),
        gauss_shape=np.abs(rng.normal(size=(nsrc, 3))) * 1e-4,
        antenna_position=wsrt_ants,
    )


def _oracle_KB(obs, corrs):
    """Unfused composition: K * B summed over sources."""
    from africanus_tpu.coordinates import radec_to_lm

    lm = np.asarray(radec_to_lm(obs["radec"], obs["phase_dir"]))
    K = np.asarray(phase_delay(lm, obs["uvw"], obs["chan_freq"]))
    spec = np.asarray(
        spectral_model(obs["stokes"], obs["spi"], obs["ref_freq"],
                       obs["chan_freq"], base="std")
    )
    B = np.asarray(convert(spec, ["I", "Q", "U", "V"], corrs))
    return np.einsum("srf,sfc->rfc", K, B)


def test_fused_rime_KB(obs):
    out = rime("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]", obs,
               spi_base="standard")
    got = to_numpy(out)
    expected = _oracle_KB(obs, ["XX", "XY", "YX", "YY"])
    assert got.shape == expected.shape
    assert_allclose(got, expected, rtol=1e-9, atol=1e-10)


def test_fused_rime_KGB(obs):
    out = rime("(Kpq, Gpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]", obs)
    got = to_numpy(out)

    from africanus_tpu.coordinates import radec_to_lm

    lm = np.asarray(radec_to_lm(obs["radec"], obs["phase_dir"]))
    K = np.asarray(phase_delay(lm, obs["uvw"], obs["chan_freq"]))
    env = np.asarray(gaussian(obs["uvw"], obs["chan_freq"], obs["gauss_shape"]))
    spec = np.asarray(
        spectral_model(obs["stokes"], obs["spi"], obs["ref_freq"],
                       obs["chan_freq"], base="std")
    )
    B = np.asarray(convert(spec, ["I", "Q", "U", "V"],
                           ["XX", "XY", "YX", "YY"]))
    expected = np.einsum("srf,sfc->rfc", K * env, B)
    assert_allclose(got, expected, rtol=1e-9, atol=1e-10)


def test_fused_rime_feed_rotation(obs):
    """L (feed rotation) wrapping the K·B chain must equal the explicit
    per-row 2x2 sandwich L1 · V · L2ᴴ."""
    out = rime("[Lp, (Kpq, Bpq), Lq]: [I,Q,U,V] -> [XX,XY,YX,YY]", obs)
    got = to_numpy(out)

    coh = _oracle_KB(obs, ["XX", "XY", "YX", "YY"])
    nrow, nchan = coh.shape[:2]
    coh = coh.reshape(nrow, nchan, 2, 2)

    utime, tinv = np.unique(obs["time"], return_inverse=True)
    pa = parallactic_angles(utime, obs["antenna_position"],
                            obs["phase_dir"], backend="numpy")
    L = np.asarray(feed_rotation(pa, "linear"))  # (utime, ant, 2, 2)
    L1 = L[tinv, obs["antenna1"]][:, None]  # (row, 1, 2, 2)
    L2 = L[tinv, obs["antenna2"]][:, None]
    expected = L1 @ coh @ np.conj(np.swapaxes(L2, -1, -2))
    assert_allclose(got.reshape(expected.shape), expected, rtol=1e-8,
                    atol=1e-9)


def test_fused_rime_diag(obs):
    out = rime("(Kpq, Bpq): [I,Q] -> [XX,YY]", obs)
    got = to_numpy(out)
    from africanus_tpu.coordinates import radec_to_lm

    lm = np.asarray(radec_to_lm(obs["radec"], obs["phase_dir"]))
    K = np.asarray(phase_delay(lm, obs["uvw"], obs["chan_freq"]))
    spec = np.asarray(
        spectral_model(obs["stokes"][:, :2], obs["spi"][:, :, :2],
                       obs["ref_freq"], obs["chan_freq"], base="std")
    )
    B = np.asarray(convert(spec, ["I", "Q"], ["XX", "YY"]))
    expected = np.einsum("srf,sfc->rfc", K, B)
    assert_allclose(got, expected, rtol=1e-9)


def test_spec_parsing_and_errors():
    spec = RimeSpecification("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    assert spec.equation == ["Kpq", "Bpq"]
    assert spec.stokes == ["I", "Q", "U", "V"]
    assert spec.corrs == ["XX", "XY", "YX", "YY"]
    assert spec.feed_type == "linear"
    assert hash(spec) == hash(
        RimeSpecification("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    )

    circ = RimeSpecification("(Kpq, Bpq): [I,V] -> [RR,LL]")
    assert circ.feed_type == "circular"

    with pytest.raises(RimeParseError):
        RimeSpecification("no colon here")
    with pytest.raises(RimeParseError):
        RimeSpecification("(Kpq): [I] - [XX]")
    with pytest.raises(ValueError):
        RimeSpecification("(Zpq, Bpq): [I] -> [XX]")


def test_factory_cached(obs):
    f1 = rime("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]", obs)
    from africanus_tpu.rime.fused.core import _cached_factory

    a = _cached_factory("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    b = _cached_factory("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    assert a is b


def test_fused_rime_beam_term(tmp_path, rng, obs, wsrt_ants):
    """E (beam) term through the fused RIME with a fabricated FITS beam:
    at beam centre the cos^3 model is ~1 so [Ep,(Kpq,Bpq),Eq] ~= K*B."""
    from africanus_tpu.testing.beam_factory import beam_factory
    from africanus_tpu.utils.beams import load_beam_cube

    schema = tmp_path / "fused_beam_$(corr)_$(reim).fits"
    beam_factory(polarisation_type="linear", npix=17, schema=schema, rng=rng)
    beam, extents, freq_map = load_beam_cube(schema, [9, 10, 11, 12])

    # single source: the attenuation bound below only holds per source
    # (a multi-source sum of attenuated terms can interfere upward)
    obs = dict(obs)
    for key in ("radec", "stokes", "spi", "ref_freq", "gauss_shape"):
        obs[key] = obs[key][:1]

    # zero parallactic angle: sources stay at their lm positions
    nutime = np.unique(obs["time"]).shape[0]
    nant = obs["antenna_position"].shape[0]

    # beam_factory writes the same cos^3 pattern to every correlation and
    # to both re/im parts; keep only the real diagonal so the beam is a
    # pure attenuation for this test
    beam2x2 = beam.reshape(beam.shape[:3] + (2, 2)).real.astype(complex)
    beam2x2[..., 0, 1] = 0
    beam2x2[..., 1, 0] = 0

    out = rime(
        "[Ep, (Kpq, Bpq), Eq]: [I,Q,U,V] -> [XX,XY,YX,YY]",
        obs,
        beam=beam2x2,
        beam_lm_extents=extents,
        beam_freq_map=freq_map,
        beam_parangle=np.zeros((nutime, nant)),
    )
    got = to_numpy(out)

    kb = _oracle_KB(obs, ["XX", "XY", "YX", "YY"])
    # beam gain at the (small) source offsets is close to but below 1;
    # XX/YY must be attenuated versions of the K*B chain
    ratio = np.abs(got[..., 0]) / np.abs(kb[..., 0])
    assert np.isfinite(got).all()
    assert (ratio < 1.0 + 1e-6).all()
    assert ratio.min() > 0.1  # source is inside the beam
    # the cos^3 beam narrows with frequency: attenuation must deepen
    assert (np.diff(ratio[0]) < 0).all()


def test_rime_custom_term_by_name(obs):
    """terms={"C": "Gaussian"} resolves strings to Term classes (reference
    fused/tests/test_rime.py:300) and matches the KGB composition."""
    spec = RimeSpecification(
        "(Cpq, Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]",
        terms={"C": "Gaussian"},
    )
    out = to_numpy(rime(spec, obs))
    expected = to_numpy(
        rime("(Kpq, Gpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]", obs)
    )
    assert_allclose(out, expected, rtol=1e-9, atol=1e-10)


def test_rime_bad_custom_term_name():
    from africanus_tpu.rime.fused.specification import (
        RimeSpecification,
        RimeSpecificationError,
    )

    with pytest.raises(RimeSpecificationError, match="Can't find a type"):
        RimeSpecification("(Cpq, Kpq, Bpq): [I] -> [XX]",
                          terms={"C": "NoSuchTerm"})


@pytest.mark.parametrize("block", [1, 2, 3, 5, 100])
def test_fused_rime_source_block_invariance(obs, block):
    """source_block must not change the result (the reference's
    LinearReduction property: serial source-chunk accumulation equals the
    one-shot sum; dask_predict.py:64-254)."""
    spec = "(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]"
    full = to_numpy(rime(spec, obs))
    blocked = to_numpy(rime(spec, obs, source_block=block))
    assert_allclose(blocked, full, rtol=1e-12, atol=1e-13)


def test_fused_rime_source_block_custom_term_heuristic(obs):
    """A custom term without SOURCE_ARGS still blocks correctly via the
    leading-dimension heuristic."""
    import jax.numpy as jnp
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.rime.fused.terms import Term, TermValue

    class Flux(Term):
        ARGS = ("model_flux",)

        def sample(self, state):
            f = jnp.asarray(state["model_flux"])  # (src, chan)
            c = Cplx(f[:, None, :], jnp.zeros_like(f[:, None, :]))
            return TermValue("diag", (c, c))

    nsrc = obs["radec"].shape[0]
    nchan = obs["chan_freq"].shape[0]
    ds = dict(obs)
    ds["model_flux"] = np.random.default_rng(3).uniform(
        0.5, 1.5, (nsrc, nchan)
    )
    spec = RimeSpecification("(Kpq, Fpq): [I,Q] -> [XX,YY]",
                             terms={"F": Flux})
    full = to_numpy(rime(spec, ds))
    blocked = to_numpy(rime(spec, ds, source_block=2))
    assert_allclose(blocked, full, rtol=1e-12, atol=1e-13)


def test_fused_rime_circular_corrs(obs):
    """Circular output correlations ([RR,RL,LR,LL]) against the unfused
    composition (reference test_rime strategy, circular leg)."""
    spec = "(Kpq, Bpq): [I,Q,U,V] -> [RR,RL,LR,LL]"
    got = to_numpy(rime(spec, obs))

    from africanus_tpu.coordinates import radec_to_lm

    lm = np.asarray(radec_to_lm(obs["radec"], obs["phase_dir"]))
    K = np.asarray(phase_delay(lm, obs["uvw"], obs["chan_freq"]))
    spec_np = np.asarray(
        spectral_model(obs["stokes"], obs["spi"], obs["ref_freq"],
                       obs["chan_freq"], base="std")
    )
    B = np.asarray(convert(spec_np, ["I", "Q", "U", "V"],
                           ["RR", "RL", "LR", "LL"]))
    want = np.einsum("srf,sfc->rfc", K, B)
    assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_fused_rime_row_sharding_invariance(obs):
    """Row-sharded fused evaluation equals single-device results (the
    chunking-invariance property of the reference's fused dask layer)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from functools import partial
    from africanus_tpu.rime.fused import RimeFactory

    fac = RimeFactory("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    state = fac.build_state(**obs)
    want = to_numpy(fac.evaluate(state))

    nrow = obs["time"].shape[0]
    ndev = 7 if nrow % 7 == 0 else (4 if nrow % 4 == 0 else 2)
    assert nrow % ndev == 0
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("row",))
    rsh = NamedSharding(mesh, P("row"))
    sharded = dict(state)
    for k in ("uvw", "time_inverse", "antenna1_inverse",
              "antenna2_inverse"):
        sharded[k] = jax.device_put(np.asarray(state[k]), rsh)
    got = to_numpy(fac.evaluate(sharded))
    assert_allclose(got, want, rtol=1e-10, atol=1e-11)


def test_fused_rime_source_block_with_gaussian(obs):
    """Blocked evaluation with the Gaussian term (multiple SOURCE_ARGS
    including per-source shapes) matches the one-shot grid."""
    spec = "(Kpq, Gpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]"
    full = to_numpy(rime(spec, obs))
    for block in (1, 2, 4):
        blocked = to_numpy(rime(spec, obs, source_block=block))
        assert_allclose(blocked, full, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("base", ["log", "log10"])
def test_fused_rime_log_spectral_bases(obs, base):
    """Brightness term with log/log10 spectral bases against the
    unfused spectral_model + convert composition (reference
    terms/brightness.py folds the same three bases)."""
    from africanus_tpu.coordinates import radec_to_lm

    out = rime("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]", obs,
               spi_base=base)
    got = to_numpy(out)

    lm = np.asarray(radec_to_lm(obs["radec"], obs["phase_dir"]))
    K = np.asarray(phase_delay(lm, obs["uvw"], obs["chan_freq"]))
    spec = np.asarray(
        spectral_model(obs["stokes"], obs["spi"], obs["ref_freq"],
                       obs["chan_freq"], base=base)
    )
    B = np.asarray(convert(spec, ["I", "Q", "U", "V"],
                           ["XX", "XY", "YX", "YY"]))
    want = np.einsum("srf,sfc->rfc", K, B)
    assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_fused_nonblocked_compensation_f32(rng, wsrt_ants):
    """At 10k sources in f32, the non-blocked path's double-float
    pairwise tree must agree with the blocked two_sum scan to f32 ulps,
    and both must track the f64 truth far better than a plain f32 sum
    could (the reference Kahan-sums unconditionally, fused/core.py:97-118)."""
    import jax

    nsrc, ntime, nchan = 10000, 2, 2
    nant = 4
    a1, a2 = np.triu_indices(nant, 1)
    antenna1 = np.tile(a1, ntime)
    antenna2 = np.tile(a2, ntime)
    time = np.repeat(5.03e9 + np.arange(ntime) * 8.0, a1.size)
    nrow = time.shape[0]
    obs64 = dict(
        time=time,
        antenna1=antenna1,
        antenna2=antenna2,
        radec=rng.uniform(-0.01, 0.01, (nsrc, 2)) + np.array([0.2, -0.6]),
        phase_dir=np.array([0.2, -0.6]),
        uvw=rng.uniform(-1000, 1000, (nrow, 3)),
        chan_freq=np.linspace(0.856e9, 1.712e9, nchan),
        stokes=rng.uniform(0.5, 2.0, (nsrc, 4)),
        antenna_position=wsrt_ants[:nant],
    )
    spec = "(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]"

    def as32(d):
        return {k: (np.asarray(v, np.float32)
                    if np.asarray(v).dtype == np.float64 else v)
                for k, v in d.items()}

    obs32 = as32(obs64)
    # f64 truth fed the same f32-rounded inputs (the repo's standard
    # oracle protocol) isolates accumulation error from input rounding
    obs64r = {k: (np.asarray(v, np.float64)
                  if np.asarray(v).dtype == np.float32 else v)
              for k, v in obs32.items()}
    full32 = to_numpy(rime(spec, obs32))
    blocked32 = to_numpy(rime(spec, obs32, source_block=512))
    truth = to_numpy(rime(spec, obs64r))
    scale = np.abs(truth).max()

    # blocked (two_sum scan) and non-blocked (double-float pairwise
    # tree) f32 paths agree to f32 ulps of the result — accumulation
    # order no longer changes the answer
    assert np.abs(full32 - blocked32).max() < 4e-7 * scale
    # both sit at the per-sample f32 phase-rounding floor of the f64
    # truth; the accumulation itself contributes nothing above it
    assert np.abs(full32 - truth).max() < 1e-3 * scale


@pytest.mark.parametrize("nsrc,blocks", [(335, 129), (335, 67), (35, 16)])
def test_fused_rime_chunk_sweep(rng, wsrt_ants, nsrc, blocks):
    """Combined chunk-invariance sweep at the reference's scale: uneven
    source blocking x row+chan 2D sharding must reproduce the one-shot
    grid exactly (ref experimental/rime/fused/tests/test_rime.py:37-61,
    whose dask chunk dicts split source as (129, 67, 139) and row/chan
    in twos)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from africanus_tpu.rime.fused import RimeFactory

    ntime, nchan = 2, 4
    nant = 6
    a1, a2 = np.triu_indices(nant, 1)  # 15 rows/time
    antenna1 = np.tile(np.concatenate([a1, [0]]), ntime)  # 16 rows/time
    antenna2 = np.tile(np.concatenate([a2, [1]]), ntime)
    time = np.repeat(5.03e9 + np.arange(ntime) * 8.0, a1.size + 1)
    nrow = time.shape[0]
    ds = dict(
        time=time,
        antenna1=antenna1,
        antenna2=antenna2,
        radec=rng.uniform(-0.01, 0.01, (nsrc, 2)) + np.array([0.2, -0.6]),
        phase_dir=np.array([0.2, -0.6]),
        uvw=rng.uniform(-1000, 1000, (nrow, 3)),
        chan_freq=np.linspace(0.856e9, 1.712e9, nchan),
        stokes=rng.uniform(0.5, 2.0, (nsrc, 4)),
        spi=rng.normal(scale=0.2, size=(nsrc, 1, 4)),
        ref_freq=np.full(nsrc, 1.2e9),
        antenna_position=wsrt_ants[:nant],
    )

    fac = RimeFactory("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    state = fac.build_state(**ds)
    want = to_numpy(fac.evaluate(state))

    # uneven source blocks via source_block (the scan pads the ragged
    # tail, mirroring the reference's (129, 67, 139) chunking)
    blocked = to_numpy(fac.evaluate(state, source_block=blocks))
    assert_allclose(blocked, want, rtol=1e-10, atol=1e-11)

    # 2D (row, chan) sharding on top of source blocking
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("row", "chan"))
    rsh = NamedSharding(mesh, P("row"))
    csh = NamedSharding(mesh, P("chan"))
    sharded = dict(state)
    for k in ("uvw", "time_inverse", "antenna1_inverse",
              "antenna2_inverse"):
        sharded[k] = jax.device_put(np.asarray(state[k]), rsh)
    sharded["chan_freq"] = jax.device_put(
        np.asarray(state["chan_freq"]), csh
    )
    got = to_numpy(fac.evaluate(sharded, source_block=blocks))
    assert_allclose(got, want, rtol=1e-10, atol=1e-11)


def test_fused_ufeed_shared_over_both_columns(obs):
    """feed1/feed2 with differing id sets must share ONE ufeed table
    (regression: per-column uniques left ufeed holding only feed2's set
    while feed1_inverse indexed feed1's own — inconsistent tables)."""
    nrow = obs["time"].shape[0]
    obs = dict(obs)
    obs["feed1"] = np.ones(nrow, np.int32)   # ids {1}
    obs["feed2"] = np.zeros(nrow, np.int32)  # ids {0}

    factory = RimeFactory(
        RimeSpecification("(Kpq, Bpq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    )
    state = factory._build_state(dict(obs))
    ufeed = np.asarray(state["ufeed"])
    f1 = np.asarray(state["feed1_inverse"])
    f2 = np.asarray(state["feed2_inverse"])
    assert_allclose(ufeed, [0, 1])
    assert (ufeed[f1] == 1).all() and (ufeed[f2] == 0).all()


def test_fused_beam_term_triggers_parallactic_transformer(tmp_path, rng,
                                                          obs, wsrt_ants):
    """BeamCubeDDE's parallactic inputs live in KWARGS: the transformer
    must run for a beam-only spec (regression: only ARGS were collected,
    so beam_parangle stayed absent — zero rotation — unless an L term
    happened to be present)."""
    from africanus_tpu.rime.fused.core import RimeFactory

    factory = RimeFactory(
        RimeSpecification("(Ep, Kpq, Bpq, Eq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    )
    blw = bmh = 15
    beam = (rng.normal(size=(blw, bmh, 3, 2, 2))
            + 1j * rng.normal(size=(blw, bmh, 3, 2, 2)))
    state = factory._build_state(dict(
        beam=beam,
        beam_lm_extent=np.array([[-1e-2, 1e-2], [-1e-2, 1e-2]]),
        beam_freq_map=np.linspace(0.8e9, 1.8e9, 3),
        **obs,
    ))
    assert "beam_parangle" in state
    pa = np.asarray(state["beam_parangle"])
    assert np.abs(pa).max() > 1e-3  # real rotation, not zeros
