"""BDA averaging against a hand-crafted ragged map.

Port of the reference's strongest averaging oracle
(/root/reference/africanus/averaging/tests/test_bda_averaging.py:97-250):
a 5-row × 4-chan map collapsing to 3 output rows with 2/3/1 channels,
swept over six flag patterns. Every output field (time centroid,
exposure, uvw, weight, sigma, visibilities, weight/sigma spectra, flags)
is checked against literal effective-map accumulations that honor the
all-flagged-bin pass-through semantics."""

from collections import defaultdict

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from africanus_tpu.averaging.bda_avg import row_average, row_chan_average
from africanus_tpu.averaging.bda_mapping import RowMapOutput
from africanus_tpu.ops.cplx import Cplx


BDA_MAP = np.asarray(
    [[0, 0, 1, 1], [0, 0, 1, 1], [2, 3, 3, 4], [2, 3, 3, 4], [5, 5, 5, 5]]
)

FLAG_CASES = [
    np.zeros((5, 4), int),
    np.asarray([[1] * 4, [1] * 4, [0] * 4, [0] * 4, [0] * 4]),
    np.asarray([[0] * 4, [0] * 4, [1] * 4, [0] * 4, [0] * 4]),
    np.asarray([[1] * 4, [0] * 4, [1] * 4, [0] * 4, [1] * 4]),
    np.ones((5, 4), int),
    np.asarray([[0, 1, 0, 1], [0, 1, 0, 0], [0, 0, 0, 0],
                [1, 1, 1, 1], [1, 0, 0, 0]]),
]


def _inverse_map(bda_map):
    inv = defaultdict(list)
    for idx in np.ndindex(*bda_map.shape):
        inv[bda_map[idx]].append(idx)
    return {ro: tuple(list(i) for i in zip(*v)) for ro, v in inv.items()}


def _effective_row_map(flag_row, inv_row_map):
    emap = []
    for _, (rows, counts) in sorted(inv_row_map.items()):
        if flag_row[rows].all():
            emap.append((rows, counts))
        else:
            it = ((r, c) for r, c in zip(rows, counts) if flag_row[r] == 0)
            emap.append(tuple(map(list, zip(*it))))
    return emap


def _effective_rowchan_map(flags, inv_map):
    emap = []
    for _, (rows, chans) in sorted(inv_map.items()):
        if flags[rows, chans].all():
            emap.append((rows, chans))
        else:
            it = ((r, c) for r, c in zip(rows, chans)
                  if flags[r, c] == 0)
            emap.append(tuple(map(list, zip(*it))))
    return emap


@pytest.mark.parametrize("flags", FLAG_CASES, ids=range(len(FLAG_CASES)))
def test_bda_avg_in_parts(flags):
    rs = np.random.RandomState(42)
    bda_map = BDA_MAP
    inv_map = _inverse_map(bda_map)
    flag_row = flags.all(axis=1)

    in_row, in_chan = bda_map.shape
    in_corr = 4
    out_row = bda_map.max() + 1
    offsets = np.array([0, 2, 5, out_row])
    assert_array_equal(offsets[:-1], np.unique(bda_map[:, 0]))

    time = np.linspace(1.0, float(in_row), in_row)
    interval = np.full(in_row, 1.0)
    uvw = np.arange(in_row * 3).reshape(in_row, 3).astype(np.float64)
    weight = rs.normal(size=(in_row, in_corr))
    sigma = rs.normal(size=(in_row, in_corr))
    out_chan = np.diff(offsets)
    chan_width = np.repeat(0.856e9 / out_chan, out_chan)

    inv_row_map = {
        ro: np.unique(rows, return_counts=True)
        for ro, (rows, _) in inv_map.items()
    }
    out_time = np.array([
        time[rows].sum() / len(counts)
        for _, (rows, counts) in sorted(inv_row_map.items())
    ])
    out_interval = np.array([
        interval[rows].sum() for _, (rows, _) in sorted(inv_row_map.items())
    ])
    out_flag_row = np.array([
        flag_row[rows].all() for _, (rows, _) in sorted(inv_row_map.items())
    ])

    meta = RowMapOutput(bda_map, offsets, chan_width, out_time,
                        out_interval, None, out_flag_row)

    ant1 = np.zeros(in_row, np.int32)
    ant2 = np.ones(in_row, np.int32)
    row_avg = row_average(
        meta, ant1, ant2, time_centroid=time, exposure=interval, uvw=uvw,
        weight=weight, sigma=sigma, flag_row=flag_row,
    )
    assert_array_equal(np.asarray(row_avg.antenna1), 0)
    assert_array_equal(np.asarray(row_avg.antenna2), 1)

    emap = _effective_row_map(flag_row, inv_row_map)
    want_tc = [time[r].sum() / len(c) for r, c in emap]
    want_exp = [interval[r].sum() for r, _ in emap]
    want_uvw = [uvw[r].sum(axis=0) / len(c) for r, c in emap]
    want_wt = [weight[r].sum(axis=0) for r, _ in emap]

    def calc_sigma(rows):
        w, s = weight[rows], sigma[rows]
        num = (s**2 * w**2).sum(axis=0)
        den = w.sum(axis=0) ** 2
        den[den == 0.0] = 1.0
        return np.sqrt(num / den)

    want_sig = [calc_sigma(r) for r, _ in emap]

    assert_allclose(np.asarray(row_avg.time_centroid), want_tc)
    assert_allclose(np.asarray(row_avg.exposure), want_exp)
    assert_allclose(np.asarray(row_avg.uvw), want_uvw)
    assert_allclose(np.asarray(row_avg.weight), want_wt)
    assert_allclose(np.asarray(row_avg.sigma), want_sig, atol=1e-12)

    vshape = (in_row, in_chan, in_corr)
    vre = rs.normal(size=vshape)
    vim = rs.normal(size=vshape)
    weight_spectrum = rs.normal(size=vshape)
    sigma_spectrum = rs.normal(size=vshape)
    flag = np.broadcast_to(flags[:, :, None] != 0, vshape)

    rc = row_chan_average(
        meta, flag_row=flag_row, visibilities=Cplx(vre, vim),
        weight_spectrum=weight_spectrum, sigma_spectrum=sigma_spectrum,
        flag=flag,
    )

    emap_rc = _effective_rowchan_map(flags, inv_map)
    want_ws = np.stack([
        weight_spectrum[r, c, :].sum(axis=0) for r, c in emap_rc
    ])
    want_ss = np.stack([
        (sigma_spectrum[r, c, :]**2 * weight_spectrum[r, c, :]**2)
        .sum(axis=0)
        for r, c in emap_rc
    ])
    want_vis = np.stack([
        ((vre[r, c, :] + 1j * vim[r, c, :])
         * weight_spectrum[r, c, :]).sum(axis=0)
        for r, c in emap_rc
    ])
    want_flag = np.stack([flag[r, c, :].all(axis=0) for r, c in emap_rc])

    wdiv = want_ws.copy()
    wdiv[wdiv == 0.0] = 1.0
    want_vis /= wdiv
    want_ss = np.sqrt(want_ss / wdiv**2)

    got_vis = np.asarray(rc.visibilities.re) + 1j * np.asarray(
        rc.visibilities.im
    )
    assert_allclose(got_vis, want_vis, atol=1e-10)
    assert_array_equal(np.asarray(rc.flag), want_flag)
    assert_allclose(np.asarray(rc.weight_spectrum), want_ws, atol=1e-12)
    assert_allclose(np.asarray(rc.sigma_spectrum), want_ss, atol=1e-12)
