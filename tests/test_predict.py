"""predict_vis parity vs numpy einsum oracles — the same oracle strategy the
reference uses (rime/tests/test_predict.py einsum signatures)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.rime.predict import predict_vis, apply_gains


def _rc(rng, shape):
    return rng.normal(size=shape) + 1j * rng.normal(size=shape)


@pytest.fixture
def problem(rng):
    nsrc, ntime, nant, nchan = 4, 3, 5, 6
    # all baselines (incl. auto) per time
    a1, a2 = np.triu_indices(nant, 0)
    antenna1 = np.tile(a1, ntime)
    antenna2 = np.tile(a2, ntime)
    time_index = np.repeat(np.arange(ntime), a1.size)
    return dict(
        nsrc=nsrc,
        ntime=ntime,
        nant=nant,
        nchan=nchan,
        nrow=antenna1.size,
        time_index=time_index,
        antenna1=antenna1,
        antenna2=antenna2,
    )


def np_predict_diag(p, dde1, coh, dde2, die1, bvis, die2):
    ti, a1, a2 = p["time_index"], p["antenna1"], p["antenna2"]
    out = None
    if dde1 is not None or coh is not None:
        j1 = dde1[:, ti, a1] if dde1 is not None else None
        j2c = np.conj(dde2[:, ti, a2]) if dde2 is not None else None
        if j1 is not None and coh is not None:
            out = (j1 * coh * j2c).sum(axis=0)
        elif j1 is not None:
            out = (j1 * j2c).sum(axis=0)
        else:
            out = coh.sum(axis=0)
    if bvis is not None:
        out = bvis if out is None else out + bvis
    if die1 is not None:
        if out is None:
            out = np.zeros_like(die1[ti, a1])
        out = die1[ti, a1] * out * np.conj(die2[ti, a2])
    return out


def np_predict_full(p, dde1, coh, dde2, die1, bvis, die2):
    ti, a1, a2 = p["time_index"], p["antenna1"], p["antenna2"]
    out = None
    if dde1 is not None or coh is not None:
        if dde1 is not None and coh is not None:
            j1 = dde1[:, ti, a1]
            j2h = np.conj(np.swapaxes(dde2[:, ti, a2], -1, -2))
            out = np.einsum("srfij,srfjk,srfkl->rfil", j1, coh, j2h)
        elif dde1 is not None:
            j1 = dde1[:, ti, a1]
            j2h = np.conj(np.swapaxes(dde2[:, ti, a2], -1, -2))
            out = np.einsum("srfij,srfjk->rfik", j1, j2h)
        else:
            out = coh.sum(axis=0)
    if bvis is not None:
        out = bvis if out is None else out + bvis
    if die1 is not None:
        if out is None:
            out = np.zeros(
                (ti.shape[0],) + die1.shape[2:], dtype=die1.dtype
            )
        g1 = die1[ti, a1]
        g2h = np.conj(np.swapaxes(die2[ti, a2], -1, -2))
        out = np.einsum("rfij,rfjk,rfkl->rfil", g1, out, g2h)
    return out


# Full presence cross-product, mirroring the reference's
# dde_presence × die_presence parametrizations
# (rime/tests/test_predict.py:44-60): DDE-layer options × DIE-layer
# options, minus the all-absent combination (an error case).
_DDE_LAYER = [(True, True), (True, False), (False, True)]
_DIE_LAYER = [(True, True), (True, False), (False, True), (False, False)]
CASES = [
    (ddes, coh, bvis, dies)
    for ddes, coh in _DDE_LAYER + [(False, False)]
    for bvis, dies in _DIE_LAYER
    if ddes or coh or bvis or dies
]


@pytest.mark.parametrize("corrs", [(2, 2), (2,), (1,)])
@pytest.mark.parametrize("case", CASES)
def test_predict_vis_parity(rng, problem, corrs, case):
    p = problem
    have_ddes, have_coh, have_bvis, have_dies = case
    S, T, A, F, R = p["nsrc"], p["ntime"], p["nant"], p["nchan"], p["nrow"]

    dde1 = _rc(rng, (S, T, A, F) + corrs) if have_ddes else None
    dde2 = _rc(rng, (S, T, A, F) + corrs) if have_ddes else None
    coh = _rc(rng, (S, R, F) + corrs) if have_coh else None
    bvis = _rc(rng, (R, F) + corrs) if have_bvis else None
    die1 = _rc(rng, (T, A, F) + corrs) if have_dies else None
    die2 = _rc(rng, (T, A, F) + corrs) if have_dies else None

    out = np.asarray(
        predict_vis(
            p["time_index"], p["antenna1"], p["antenna2"],
            dde1, coh, dde2, die1, bvis, die2,
        )
    )

    oracle = np_predict_full if corrs == (2, 2) else np_predict_diag
    expected = oracle(p, dde1, coh, dde2, die1, bvis, die2)

    assert out.shape == (R, F) + corrs
    assert_allclose(out, expected, rtol=1e-11, atol=1e-12)


def test_predict_vis_source_block(rng, problem):
    p = problem
    S, T, A, F, R = p["nsrc"], p["ntime"], p["nant"], p["nchan"], p["nrow"]
    dde1 = _rc(rng, (S, T, A, F, 2, 2))
    dde2 = _rc(rng, (S, T, A, F, 2, 2))
    coh = _rc(rng, (S, R, F, 2, 2))

    full = np.asarray(
        predict_vis(p["time_index"], p["antenna1"], p["antenna2"], dde1, coh, dde2)
    )
    blocked = np.asarray(
        predict_vis(
            p["time_index"], p["antenna1"], p["antenna2"], dde1, coh, dde2,
            source_block=2,
        )
    )
    assert_allclose(blocked, full, rtol=1e-12)


def test_predict_vis_errors(rng, problem):
    p = problem
    S, T, A, F, R = p["nsrc"], p["ntime"], p["nant"], p["nchan"], p["nrow"]
    dde1 = _rc(rng, (S, T, A, F, 2, 2))
    coh = _rc(rng, (S, R, F, 2, 2))

    with pytest.raises(ValueError, match="must be present or absent"):
        predict_vis(p["time_index"], p["antenna1"], p["antenna2"], dde1, coh)
    with pytest.raises(ValueError, match="Insufficient inputs"):
        predict_vis(p["time_index"], p["antenna1"], p["antenna2"])
    with pytest.raises(ValueError, match="not in"):
        predict_vis(p["time_index"], p["antenna1"], p["antenna2"],
                    source_coh=coh[..., 0, 0])


def test_apply_gains(rng, problem):
    p = problem
    T, A, F, R = p["ntime"], p["nant"], p["nchan"], p["nrow"]
    g1 = _rc(rng, (T, A, F, 2, 2))
    g2 = _rc(rng, (T, A, F, 2, 2))
    vis = _rc(rng, (R, F, 2, 2))

    out = np.asarray(
        apply_gains(p["time_index"], p["antenna1"], p["antenna2"], g1, vis, g2)
    )
    expected = np_predict_full(p, None, None, None, g1, vis, g2)
    assert_allclose(out, expected, rtol=1e-11)


@pytest.mark.parametrize("corrs", [(2, 2), (2,)])
@pytest.mark.parametrize("case", [
    (True, True, False, False),
    (False, True, True, True),
    (True, True, True, True),
])
def test_predict_vis_row_sharding(rng, problem, corrs, case):
    """Row-sharded execution must match single-device results — the TPU
    analogue of the reference's chunking-invariance sweeps
    (rime/tests/test_predict.py chunk_parametrization), across term
    presence and correlation shapes."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    p = problem
    have_ddes, have_coh, have_bvis, have_dies = case
    S, T, A, F, R = p["nsrc"], p["ntime"], p["nant"], p["nchan"], p["nrow"]
    dde1 = _rc(rng, (S, T, A, F) + corrs) if have_ddes else None
    dde2 = _rc(rng, (S, T, A, F) + corrs) if have_ddes else None
    coh = _rc(rng, (S, R, F) + corrs) if have_coh else None
    bvis = _rc(rng, (R, F) + corrs) if have_bvis else None
    die1 = _rc(rng, (T, A, F) + corrs) if have_dies else None
    die2 = _rc(rng, (T, A, F) + corrs) if have_dies else None

    expected = np.asarray(
        predict_vis(p["time_index"], p["antenna1"], p["antenna2"],
                    dde1, coh, dde2, die1, bvis, die2)
    )

    mesh = Mesh(np.array(jax.devices()[:5]), ("row",))
    rsh = NamedSharding(mesh, P("row"))
    put_r = lambda x: None if x is None else jax.device_put(x, rsh)  # noqa: E731
    coh_s = (None if coh is None
             else jax.device_put(coh, NamedSharding(mesh, P(None, "row"))))
    bvis_s = put_r(bvis)
    ti_s = put_r(p["time_index"])
    a1_s = put_r(p["antenna1"])
    a2_s = put_r(p["antenna2"])

    out = np.asarray(
        predict_vis(ti_s, a1_s, a2_s, dde1, coh_s, dde2, die1, bvis_s,
                    die2)
    )
    assert_allclose(out, expected, rtol=1e-12)


@pytest.mark.parametrize("corrs", [(2, 2), (1,)])
def test_predict_vis_f32_leg(rng, problem, corrs):
    """The f32 path (the only dtype the real device runs) must stay
    within the f32 error budget of the f64 result — every other test in
    this suite runs x64."""
    p = problem
    S, T, A, F, R = p["nsrc"], p["ntime"], p["nant"], p["nchan"], p["nrow"]
    coh = _rc(rng, (S, R, F) + corrs)
    die1 = _rc(rng, (T, A, F) + corrs)
    die2 = _rc(rng, (T, A, F) + corrs)

    want = np.asarray(
        predict_vis(p["time_index"], p["antenna1"], p["antenna2"],
                    source_coh=coh, die1_jones=die1, die2_jones=die2)
    )
    got = np.asarray(
        predict_vis(
            p["time_index"], p["antenna1"], p["antenna2"],
            source_coh=coh.astype(np.complex64),
            die1_jones=die1.astype(np.complex64),
            die2_jones=die2.astype(np.complex64),
        )
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-5 * scale
