"""Calibration parity tests (reference: calibration/utils/*.py,
calibration/phase_only/phase_only.py) with a simulated observation, the
same strategy as the reference's calibration conftest simulators."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.calibration import (
    check_type,
    chunkify_rows,
    corrupt_vis,
    correct_vis,
    residual_vis,
    compute_and_corrupt_vis,
    compute_jhj,
    compute_jhr,
    compute_jhj_and_jhr,
    gauss_newton,
    DIAG_DIAG,
    DIAG,
    FULL,
)

C = 2.99792458e8


@pytest.fixture
def obs(rng):
    """Small observation: rows grouped by unique time."""
    ntime, nant, nchan, ndir = 4, 5, 3, 2
    a1, a2 = np.triu_indices(nant, 1)
    nbl = a1.size
    antenna1 = np.tile(a1, ntime)
    antenna2 = np.tile(a2, ntime)
    time = np.repeat(np.arange(ntime, dtype=np.float64), nbl)
    _, tbi, tbc = chunkify_rows(time, 1)
    return dict(
        ntime=ntime, nant=nant, nchan=nchan, ndir=ndir,
        nrow=antenna1.size, antenna1=antenna1, antenna2=antenna2,
        tbi=tbi, tbc=tbc,
    )


def _rc(rng, shape):
    return rng.normal(size=shape) + 1j * rng.normal(size=shape)


def np_corrupt_diag_diag(o, jones, model):
    out = np.zeros(model.shape[:2] + model.shape[3:], model.dtype)
    for t in range(o["ntime"]):
        for row in range(o["tbi"][t], o["tbi"][t] + o["tbc"][t]):
            p, q = o["antenna1"][row], o["antenna2"][row]
            for nu in range(o["nchan"]):
                for s in range(model.shape[2]):
                    out[row, nu] += (
                        jones[t, p, nu, s]
                        * model[row, nu, s]
                        * np.conj(jones[t, q, nu, s])
                    )
    return out


def np_corrupt_full(o, jones, model):
    out = np.zeros(model.shape[:2] + model.shape[3:], model.dtype)
    for t in range(o["ntime"]):
        for row in range(o["tbi"][t], o["tbi"][t] + o["tbc"][t]):
            p, q = o["antenna1"][row], o["antenna2"][row]
            for nu in range(o["nchan"]):
                for s in range(o["ndir"]):
                    out[row, nu] += (
                        jones[t, p, nu, s]
                        @ model[row, nu, s]
                        @ np.conj(jones[t, q, nu, s].T)
                    )
    return out


def test_check_type(rng, obs):
    o = obs
    jones5 = _rc(rng, (o["ntime"], o["nant"], o["nchan"], o["ndir"], 2))
    jones6 = _rc(rng, (o["ntime"], o["nant"], o["nchan"], o["ndir"], 2, 2))
    vis3 = _rc(rng, (o["nrow"], o["nchan"], 2))
    vis4 = _rc(rng, (o["nrow"], o["nchan"], 2, 2))
    assert check_type(jones5, vis3) == DIAG_DIAG
    assert check_type(jones5, vis4) == DIAG
    assert check_type(jones6, vis4) == FULL
    with pytest.raises(RuntimeError):
        check_type(jones6, vis3)


def test_chunkify_rows():
    time = np.array([0.0, 0.0, 1.0, 1.0, 1.0, 2.0])
    chunks, tbi, tbc = chunkify_rows(time, 2)
    assert chunks == (5, 1)
    assert list(tbi) == [0, 2, 5]
    assert list(tbc) == [2, 3, 1]


def test_corrupt_vis_diag_diag(rng, obs):
    o = obs
    jones = _rc(rng, (o["ntime"], o["nant"], o["nchan"], o["ndir"], 2))
    model = _rc(rng, (o["nrow"], o["nchan"], o["ndir"], 2))
    out = np.asarray(
        corrupt_vis(o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones, model)
    )
    assert_allclose(out, np_corrupt_diag_diag(o, jones, model), rtol=1e-12)


def test_corrupt_vis_full(rng, obs):
    o = obs
    jones = _rc(rng, (o["ntime"], o["nant"], o["nchan"], o["ndir"], 2, 2))
    model = _rc(rng, (o["nrow"], o["nchan"], o["ndir"], 2, 2))
    out = np.asarray(
        corrupt_vis(o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones, model)
    )
    assert_allclose(out, np_corrupt_full(o, jones, model), rtol=1e-12)


@pytest.mark.parametrize("mode", ["diag_diag", "diag", "full"])
def test_correct_inverts_corrupt(rng, obs, mode):
    """correct_vis(corrupt_vis(V)) == V for single-direction gains."""
    o = obs
    if mode == "diag_diag":
        jshape = (o["ntime"], o["nant"], o["nchan"], 1, 2)
        vshape = (o["nrow"], o["nchan"], 2)
        mshape = (o["nrow"], o["nchan"], 1, 2)
    elif mode == "diag":
        jshape = (o["ntime"], o["nant"], o["nchan"], 1, 2)
        vshape = (o["nrow"], o["nchan"], 2, 2)
        mshape = (o["nrow"], o["nchan"], 1, 2, 2)
    else:
        jshape = (o["ntime"], o["nant"], o["nchan"], 1, 2, 2)
        vshape = (o["nrow"], o["nchan"], 2, 2)
        mshape = (o["nrow"], o["nchan"], 1, 2, 2)

    jones = _rc(rng, jshape) + np.full(jshape, 2.0)  # well-conditioned
    model = _rc(rng, mshape)
    vis = np.asarray(
        corrupt_vis(o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones, model)
    )
    assert vis.shape == vshape
    flag = np.zeros(vis.shape, bool)
    flag[0, 0] = True  # one flagged cell -> zeroed output
    corrected = np.asarray(
        correct_vis(o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones, vis, flag)
    )
    assert_allclose(corrected[0, 0], 0.0)
    assert_allclose(corrected[1:], model[1:, :, 0], rtol=1e-10)


def test_residual_vis(rng, obs):
    o = obs
    jones = _rc(rng, (o["ntime"], o["nant"], o["nchan"], o["ndir"], 2))
    model = _rc(rng, (o["nrow"], o["nchan"], o["ndir"], 2))
    vis = _rc(rng, (o["nrow"], o["nchan"], 2))
    flag = rng.uniform(size=vis.shape) < 0.1

    out = np.asarray(
        residual_vis(
            o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones, vis, flag, model
        )
    )
    expected = vis - np_corrupt_diag_diag(o, jones, model)
    expected[np.any(flag, axis=-1)] = 0.0
    assert_allclose(out, expected, rtol=1e-11, atol=1e-12)


def test_compute_and_corrupt_vis(rng, obs):
    o = obs
    ncorr = 2
    jones = _rc(rng, (o["ntime"], o["nant"], o["nchan"], o["ndir"], ncorr))
    model = _rc(rng, (o["ntime"], o["nchan"], o["ndir"], ncorr))
    uvw = rng.uniform(-1000, 1000, (o["nrow"], 3))
    freq = np.linspace(1.0e9, 1.5e9, o["nchan"])
    lm = rng.uniform(-0.01, 0.01, (o["ntime"], o["ndir"], 2))

    out = np.asarray(
        compute_and_corrupt_vis(
            o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones, model,
            uvw, freq, lm,
        )
    )

    expected = np.zeros((o["nrow"], o["nchan"], ncorr), np.complex128)
    m2pioc = -2 * np.pi / C
    for t in range(o["ntime"]):
        for row in range(o["tbi"][t], o["tbi"][t] + o["tbc"][t]):
            p, q = o["antenna1"][row], o["antenna2"][row]
            u, v, w = uvw[row]
            for nu in range(o["nchan"]):
                for s in range(o["ndir"]):
                    l, m = lm[t, s]
                    n = np.sqrt(1 - l * l - m * m)
                    rp = m2pioc * freq[nu] * (u * l + v * m + w * (n - 1))
                    sv = model[t, nu, s] * np.exp(1j * rp) / n
                    expected[row, nu] += (
                        jones[t, p, nu, s] * sv * np.conj(jones[t, q, nu, s])
                    )
    assert_allclose(out, expected, rtol=1e-10, atol=1e-11)


def np_jhj_jhr(o, jones, residual, model, flag):
    jhj = np.zeros(jones.shape, jones.real.dtype)
    jhr = np.zeros(jones.shape, jones.dtype)
    for t in range(o["ntime"]):
        for row in range(o["tbi"][t], o["tbi"][t] + o["tbc"][t]):
            p, q = o["antenna1"][row], o["antenna2"][row]
            for nu in range(o["nchan"]):
                if np.any(flag[row, nu]):
                    continue
                for s in range(o["ndir"]):
                    gp = jones[t, p, nu, s]
                    gq = jones[t, q, nu, s]
                    jac = 1j * gp * model[row, nu, s] * np.conj(gq)
                    jhj[t, p, nu, s] += (np.conj(jac) * jac).real
                    jhr[t, p, nu, s] += np.conj(jac) * residual[row, nu]
                    jac = -1j * gp * model[row, nu, s] * np.conj(gq)
                    jhj[t, q, nu, s] += (np.conj(jac) * jac).real
                    jhr[t, q, nu, s] += np.conj(jac) * residual[row, nu]
    return jhj, jhr


def test_jhj_jhr_parity(rng, obs):
    o = obs
    jones = _rc(rng, (o["ntime"], o["nant"], o["nchan"], o["ndir"], 2))
    model = _rc(rng, (o["nrow"], o["nchan"], o["ndir"], 2))
    residual = _rc(rng, (o["nrow"], o["nchan"], 2))
    flag = rng.uniform(size=residual.shape) < 0.1

    jhj = np.asarray(
        compute_jhj(o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones,
                    model, flag)
    )
    jhr = np.asarray(
        compute_jhr(o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones,
                    residual, model, flag)
    )
    e_jhj, e_jhr = np_jhj_jhr(o, jones, residual, model, flag)
    assert_allclose(jhj, e_jhj, rtol=1e-11)
    assert_allclose(jhr, e_jhr, rtol=1e-11, atol=1e-12)

    jhj2, jhr2 = compute_jhj_and_jhr(
        o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones, residual,
        model, flag,
    )
    assert_allclose(np.asarray(jhj2), e_jhj, rtol=1e-11)
    assert_allclose(np.asarray(jhr2), e_jhr, rtol=1e-11, atol=1e-12)


def test_gauss_newton_recovers_phases(rng, obs):
    """Simulate phase-corrupted data and solve: recovered gains must match
    the true gains up to the usual per-(chan, dir) phase ambiguity, checked
    via gain products on baselines (reference test strategy)."""
    o = obs
    shape = (o["ntime"], o["nant"], o["nchan"], 1, 2)
    true_phases = rng.uniform(-0.5, 0.5, shape)
    true_jones = np.exp(1j * true_phases)
    model = (
        rng.uniform(1.0, 2.0, (o["nrow"], o["nchan"], 1, 2))
        + 1j * rng.uniform(-0.1, 0.1, (o["nrow"], o["nchan"], 1, 2))
    )
    vis = np_corrupt_diag_diag(o, true_jones, model)
    flag = np.zeros(vis.shape, bool)
    weight = np.ones(vis.shape)

    jones0 = np.ones(shape, np.complex128)
    jones, jhj, jhr, k = gauss_newton(
        o["tbi"], o["tbc"], o["antenna1"], o["antenna2"], jones0,
        vis.copy(), flag, model.copy(), weight, tol=1e-8, maxiter=200,
    )
    jones = np.asarray(jones)
    assert int(k) < 200

    # compare baseline gain products (invariant to per-antenna phase offset)
    for t in range(o["ntime"]):
        for row in range(o["tbi"][t], o["tbi"][t] + o["tbc"][t]):
            p, q = o["antenna1"][row], o["antenna2"][row]
            assert_allclose(
                jones[t, p] * np.conj(jones[t, q]),
                true_jones[t, p] * np.conj(true_jones[t, q]),
                rtol=1e-5,
            )


@pytest.mark.parametrize(
    "corr_shape, jones_shape",
    [
        ((1,), (1,)),    # DIAG_DIAG scalar
        ((2,), (2,)),    # DIAG_DIAG
        ((2, 2), (2,)),  # DIAG
        ((2, 2), (2, 2)),  # FULL
    ],
)
def test_corrupt_vis_equals_predict_vis(rng, corr_shape, jones_shape):
    """corrupt_vis and predict_vis implement the same Jones chain:
    across every corr/jones shape combination, corrupting a
    multi-direction model equals the rime predict with the transposed
    conventions (reference calibration/utils/tests/test_utils.py:22-73)."""
    from africanus_tpu.rime import predict_vis

    n_dir, n_time, n_chan, n_ant = 3, 8, 4, 5
    a1u, a2u = np.triu_indices(n_ant, 1)
    nbl = a1u.size
    ant1 = np.tile(a1u, n_time)
    ant2 = np.tile(a2u, n_time)
    time = np.repeat(np.arange(n_time, dtype=np.float64), nbl)
    n_row = time.size
    _, tbi, tbc = chunkify_rows(time, 1)

    jones = (rng.normal(scale=0.2,
                        size=(n_time, n_ant, n_chan, n_dir) + jones_shape)
             + 1j * rng.normal(
                 scale=0.2,
                 size=(n_time, n_ant, n_chan, n_dir) + jones_shape))
    if len(jones_shape) == 1:
        jones = jones + 1.0  # near-identity diagonal gains
    else:
        jones[..., 0, 0] += 1.0
        jones[..., 1, 1] += 1.0
    model = (rng.normal(size=(n_row, n_chan, n_dir) + corr_shape)
             + 1j * rng.normal(size=(n_row, n_chan, n_dir) + corr_shape))

    vis = np.asarray(
        corrupt_vis(tbi, tbc, ant1, ant2, jones, model)
    )

    # predict_vis conventions: source-major jones/coherencies; DIAG
    # gains broadcast onto the 2x2 diagonal
    pj = jones
    if jones_shape != corr_shape:
        tmp = np.zeros((n_time, n_ant, n_chan, n_dir) + corr_shape,
                       complex)
        tmp[..., 0, 0] = jones[..., 0]
        tmp[..., 1, 1] = jones[..., 1]
        pj = tmp
    if len(corr_shape) == 2:
        pj = np.transpose(pj, [3, 0, 1, 2, 4, 5])
        pm = np.transpose(model, [2, 0, 1, 3, 4])
    else:
        pj = np.transpose(pj, [3, 0, 1, 2, 4])
        pm = np.transpose(model, [2, 0, 1, 3])

    time_index = np.unique(time, return_inverse=True)[1]
    want = np.asarray(
        predict_vis(time_index, ant1, ant2, source_coh=pm,
                    dde1_jones=pj, dde2_jones=pj)
    )
    assert_allclose(vis, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize(
    "corr_shape, jones_shape",
    [((2,), (2,)), ((2, 2), (2,)), ((2, 2), (2, 2))],
)
def test_residual_vis_subtracts_per_direction(rng, corr_shape,
                                              jones_shape):
    """residual_vis(vis, model) == vis − corrupt(model) across shape
    modes (reference test_residual_vis, test_utils.py:76-129)."""
    from africanus_tpu.calibration import residual_vis

    n_dir, n_time, n_chan, n_ant = 2, 6, 3, 4
    a1u, a2u = np.triu_indices(n_ant, 1)
    nbl = a1u.size
    ant1 = np.tile(a1u, n_time)
    ant2 = np.tile(a2u, n_time)
    time = np.repeat(np.arange(n_time, dtype=np.float64), nbl)
    n_row = time.size
    _, tbi, tbc = chunkify_rows(time, 1)

    jones = (rng.normal(scale=0.1,
                        size=(n_time, n_ant, n_chan, n_dir) + jones_shape)
             + 1j * rng.normal(
                 scale=0.1,
                 size=(n_time, n_ant, n_chan, n_dir) + jones_shape))
    if len(jones_shape) == 1:
        jones = jones + 1.0
    else:
        jones[..., 0, 0] += 1.0
        jones[..., 1, 1] += 1.0
    model = (rng.normal(size=(n_row, n_chan, n_dir) + corr_shape)
             + 1j * rng.normal(size=(n_row, n_chan, n_dir) + corr_shape))
    vis = (rng.normal(size=(n_row, n_chan) + corr_shape)
           + 1j * rng.normal(size=(n_row, n_chan) + corr_shape))
    flag = np.zeros(vis.shape, bool)

    res = np.asarray(
        residual_vis(tbi, tbc, ant1, ant2, jones, vis, flag, model)
    )
    corrupted = np.asarray(
        corrupt_vis(tbi, tbc, ant1, ant2, jones, model)
    )
    assert_allclose(res, vis - corrupted, rtol=1e-10, atol=1e-12)


def test_jhj_jhr_offset_time_bin_indices(rng):
    """Chunked callers pass absolute row offsets in time_bin_indices —
    the gather table must rebaseline them like the reference
    (phase_only.py:137); previously everything summed into time bin 0."""
    from africanus_tpu.calibration.phase_only import compute_jhj

    ntime, nant, nchan, ndir, ncorr = 2, 3, 2, 1, 1
    nbl = nant * (nant - 1) // 2
    a1, a2 = np.triu_indices(nant, 1)
    a1 = np.tile(a1, ntime).astype(np.int32)
    a2 = np.tile(a2, ntime).astype(np.int32)
    tbc = np.full(ntime, nbl, np.int32)

    shape = (ntime, nant, nchan, ndir, ncorr)
    jones = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    mshape = (ntime * nbl, nchan, ndir, ncorr)
    model = rng.normal(size=mshape) + 1j * rng.normal(size=mshape)
    flag = np.zeros(mshape[:2] + (ncorr,), np.uint8)

    tbi0 = (np.arange(ntime) * nbl).astype(np.int32)
    ref = np.asarray(compute_jhj(tbi0, tbc, a1, a2, jones, model, flag))
    off = np.asarray(compute_jhj(tbi0 + 1000, tbc, a1, a2, jones, model,
                                 flag))
    assert ref[1].max() > 0  # time bin 1 actually populated
    assert_allclose(off, ref, rtol=1e-12)
