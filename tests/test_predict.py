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


CASES = [
    # (have_ddes, have_coh, have_bvis, have_dies)
    (True, True, True, True),
    (True, True, False, False),
    (False, True, False, False),
    (False, True, True, True),
    (True, False, False, False),
    (False, False, True, True),
    (False, False, False, True),
    (True, True, False, True),
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


def test_predict_vis_row_sharding(rng, problem):
    """Row-sharded execution must match single-device results (the TPU
    analogue of the reference's chunking-invariance tests)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    p = problem
    S, T, A, F, R = p["nsrc"], p["ntime"], p["nant"], p["nchan"], p["nrow"]
    # R = 45 rows; pad to 48 for an even 8-way shard? Use 5 devices (45 = 9*5)
    coh = _rc(rng, (S, R, F, 2, 2))
    die1 = _rc(rng, (T, A, F, 2, 2))
    die2 = _rc(rng, (T, A, F, 2, 2))

    expected = np.asarray(
        predict_vis(p["time_index"], p["antenna1"], p["antenna2"],
                    source_coh=coh, die1_jones=die1, die2_jones=die2)
    )

    mesh = Mesh(np.array(jax.devices()[:5]), ("row",))
    sh = NamedSharding(mesh, P(None, "row"))
    rsh = NamedSharding(mesh, P("row"))
    coh_s = jax.device_put(coh, sh)
    ti_s = jax.device_put(p["time_index"], rsh)
    a1_s = jax.device_put(p["antenna1"], rsh)
    a2_s = jax.device_put(p["antenna2"], rsh)

    out = np.asarray(
        predict_vis(ti_s, a1_s, a2_s, source_coh=coh_s,
                    die1_jones=die1, die2_jones=die2)
    )
    assert_allclose(out, expected, rtol=1e-12)
