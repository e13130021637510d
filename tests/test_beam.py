"""beam_cube_dde, feed_rotation, transform_sources parity vs literal numpy
oracles of the reference kernels (rime/fast_beam_cubes.py, feeds.py,
transform.py)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde, freq_grid_interp
from africanus_tpu.rime.feeds import feed_rotation
from africanus_tpu.rime.transform import transform_sources


def np_freq_grid_interp(frequency, beam_freq_map):
    beam_nud = beam_freq_map.shape[0]
    out = np.empty((frequency.shape[0], 3))
    for f, freq in enumerate(frequency):
        lower, upper = 0, beam_nud - 1
        while lower <= upper:
            mid = lower + (upper - lower) // 2
            bf = beam_freq_map[mid]
            if bf < freq:
                lower = mid + 1
            elif bf > freq:
                upper = mid - 1
            else:
                lower = mid
                break
        lower = min(lower, upper)
        upper = lower + 1
        if lower == -1:
            out[f] = (freq / beam_freq_map[0], 1.0, 0)
        elif upper == beam_nud:
            out[f] = (freq / beam_freq_map[-1], 0.0, beam_nud - 2)
        else:
            fl, fh = beam_freq_map[lower], beam_freq_map[upper]
            out[f] = (1.0, (fh - freq) / (fh - fl), lower)
    return out


def np_beam_cube_dde(beam, extents, freq_map, lm, pa, pe, ascale, freq):
    nsrc = lm.shape[0]
    ntime, nants = pa.shape
    nchan = freq.shape[0]
    lw, mh, nud_dim = beam.shape[:3]
    corrs = beam.shape[3:]
    ncorr = int(np.prod(corrs))
    fbeam = beam.reshape(lw, mh, nud_dim, ncorr)
    (ll, ul), (lo_m, um) = extents
    lmaxf, mmaxf = float(lw - 1), float(mh - 1)
    lscale, mscale = lmaxf / (ul - ll), mmaxf / (um - lo_m)
    fdata = np_freq_grid_interp(freq, freq_map)
    out = np.empty((nsrc, ntime, nants, nchan, ncorr), beam.dtype)

    for t in range(ntime):
        for a in range(nants):
            spa, cpa = np.sin(pa[t, a]), np.cos(pa[t, a])
            for s in range(nsrc):
                l, m = lm[s]
                for f in range(nchan):
                    fs, nu, gc0f = fdata[f]
                    gc0 = int(gc0f)
                    inv_nu = 1.0 - nu
                    tl = l * fs + pe[t, a, f, 0]
                    tm = m * fs + pe[t, a, f, 1]
                    vl = (tl * cpa - tm * spa) * ascale[a, f, 0]
                    vm = (tl * spa + tm * cpa) * ascale[a, f, 1]
                    vl = max(0.0, min(lscale * (vl - ll), lmaxf))
                    vm = max(0.0, min(mscale * (vm - lo_m), mmaxf))
                    gl0, gm0 = int(np.floor(vl)), int(np.floor(vm))
                    gl1, gm1 = min(gl0 + 1, lw - 1), min(gm0 + 1, mh - 1)
                    ld, md = vl - gl0, vm - gm0
                    csum = np.zeros(ncorr, beam.dtype)
                    asum = np.zeros(ncorr)
                    for gl, gm, gc, w in [
                        (gl0, gm0, gc0, (1 - ld) * (1 - md) * nu),
                        (gl1, gm0, gc0, ld * (1 - md) * nu),
                        (gl0, gm1, gc0, (1 - ld) * md * nu),
                        (gl1, gm1, gc0, ld * md * nu),
                        (gl0, gm0, gc0 + 1, (1 - ld) * (1 - md) * inv_nu),
                        (gl1, gm0, gc0 + 1, ld * (1 - md) * inv_nu),
                        (gl0, gm1, gc0 + 1, (1 - ld) * md * inv_nu),
                        (gl1, gm1, gc0 + 1, ld * md * inv_nu),
                    ]:
                        v = fbeam[gl, gm, gc]
                        csum += w * v
                        asum += w * np.abs(v)
                    for c in range(ncorr):
                        div = np.abs(csum[c])
                        csum[c] *= asum[c] if div == 0.0 else asum[c] / div
                    out[s, t, a, f] = csum
    return out.reshape((nsrc, ntime, nants, nchan) + corrs)


@pytest.fixture
def beam_setup(rng):
    lw, mh, nud = 10, 10, 8
    beam = rng.normal(size=(lw, mh, nud, 2, 2)) + 1j * rng.normal(
        size=(lw, mh, nud, 2, 2)
    )
    extents = np.array([[-0.02, 0.02], [-0.02, 0.02]])
    freq_map = np.linspace(0.9e9, 1.6e9, nud)
    return beam, extents, freq_map


def test_freq_grid_interp_parity(beam_setup):
    _, _, freq_map = beam_setup
    # interior, below, above, exact-knot, exact-min, exact-max
    freq = np.array(
        [1.0e9, 1.23e9, 0.5e9, 2.0e9, freq_map[3], freq_map[0], freq_map[-1]]
    )
    out = np.asarray(freq_grid_interp(freq, freq_map))
    expected = np_freq_grid_interp(freq, freq_map)
    # weights must produce identical interpolation even if branch bookkeeping
    # differs at exact knots: compare effective (scale, w0*?, position)
    assert_allclose(out[:, 0], expected[:, 0], rtol=1e-12)
    # effective lower/upper slab weights at effective positions
    for i in range(freq.shape[0]):
        s_o, w_o, g_o = out[i]
        s_e, w_e, g_e = expected[i]
        eff_o = {(int(g_o), w_o), (int(g_o) + 1, 1 - w_o)}
        eff_e = {(int(g_e), w_e), (int(g_e) + 1, 1 - w_e)}
        # compare as weight maps ignoring zero-weight entries
        mo = {g: w for g, w in eff_o if abs(w) > 1e-12}
        me = {g: w for g, w in eff_e if abs(w) > 1e-12}
        assert mo.keys() == me.keys(), (freq[i], mo, me)
        for g in mo:
            assert abs(mo[g] - me[g]) < 1e-12


def test_beam_cube_dde_parity(rng, beam_setup):
    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 4, 3, 4, 5
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    pe = rng.normal(scale=1e-4, size=(ntime, nants, nchan, 2))
    ascale = rng.uniform(0.9, 1.1, (nants, nchan, 2))
    freq = np.linspace(0.85e9, 1.75e9, nchan)  # incl. outside-cube freqs

    out = np.asarray(
        beam_cube_dde(beam, extents, freq_map, lm, pa, pe, ascale, freq)
    )
    expected = np_beam_cube_dde(beam, extents, freq_map, lm, pa, pe, ascale, freq)
    assert out.shape == (nsrc, ntime, nants, nchan, 2, 2)
    assert_allclose(out, expected, rtol=1e-10, atol=1e-12)


def test_beam_cube_dde_validates_cube_size(rng, beam_setup):
    _, extents, freq_map = beam_setup
    small = rng.normal(size=(1, 10, 8, 4)) + 0j
    with pytest.raises(ValueError, match=">= 2"):
        beam_cube_dde(
            small, extents, freq_map,
            np.zeros((1, 2)), np.zeros((1, 1)),
            np.zeros((1, 1, 2, 2)), np.ones((1, 2, 2)), np.ones(2),
        )


def test_feed_rotation(rng):
    pa = rng.uniform(-np.pi, np.pi, (3, 4))

    lin = np.asarray(feed_rotation(pa, "linear"))
    assert lin.shape == (3, 4, 2, 2)
    assert_allclose(lin[..., 0, 0], np.cos(pa))
    assert_allclose(lin[..., 0, 1], np.sin(pa))
    assert_allclose(lin[..., 1, 0], -np.sin(pa))
    assert_allclose(lin[..., 1, 1], np.cos(pa))
    assert_allclose(lin.imag, 0.0)

    circ = np.asarray(feed_rotation(pa, "circular"))
    assert_allclose(circ[..., 0, 0], np.exp(-1j * pa))
    assert_allclose(circ[..., 1, 1], np.exp(1j * pa))
    assert_allclose(circ[..., 0, 1], 0.0)
    assert_allclose(circ[..., 1, 0], 0.0)

    with pytest.raises(ValueError, match="feed_type"):
        feed_rotation(pa, "bogus")


def test_transform_sources(rng):
    nsrc, ntime, na, nchan = 5, 3, 4, 6
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, na))
    pe = rng.normal(scale=1e-4, size=(ntime, na, 2))
    scale = rng.uniform(0.9, 1.1, (na, nchan))
    freq = np.linspace(0.8e9, 1.7e9, nchan)

    out = np.asarray(transform_sources(lm, pa, pe, scale, freq))
    assert out.shape == (3, nsrc, ntime, na, nchan)

    # literal oracle incl. the reference's sequential l-update quirk
    expected = np.empty_like(out)
    for t in range(ntime):
        for a in range(na):
            sp, cp = np.sin(pa[t, a]), np.cos(pa[t, a])
            for s in range(nsrc):
                l, m = lm[s]
                l = l * cp - m * sp
                m = l * sp + m * cp  # uses updated l — reference parity
                l += pe[t, a, 0]
                m += pe[t, a, 1]
                for c in range(nchan):
                    expected[0, s, t, a, c] = l * scale[a, c]
                    expected[1, s, t, a, c] = m * scale[a, c]
                    expected[2, s, t, a, c] = freq[c]
    assert_allclose(out, expected, rtol=1e-12)


def test_beam_cube_dde_pallas_matches_xla(rng, beam_setup):
    """The Pallas one-hot-matmul interpolation kernel (interpret mode)
    must match the XLA 8-gather formulation."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 4, 3, 4, 5
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    pe = rng.normal(scale=1e-4, size=(ntime, nants, nchan, 2))
    ascale = rng.uniform(0.9, 1.1, (nants, nchan, 2))
    freq = np.linspace(0.85e9, 1.75e9, nchan)

    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)
    ref = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
    got = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True)
    )
    assert got.shape == ref.shape
    # kernel computes in f32; the XLA reference here runs in f64
    assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_beam_cube_dde_pallas_chan_invariant(rng, beam_setup):
    """The chan-invariant fast path (per-slab interpolation + XLA
    frequency blend) must match the general path when pointing errors
    and antenna scaling are channel-constant and freqs are in-cube."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 4, 2, 3, 6
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    pe = np.broadcast_to(
        rng.normal(scale=1e-4, size=(ntime, nants, 1, 2)),
        (ntime, nants, nchan, 2),
    ).copy()
    ascale = np.broadcast_to(
        rng.uniform(0.9, 1.1, (nants, 1, 2)), (nants, nchan, 2)
    ).copy()
    freq = np.linspace(freq_map[0], freq_map[-1], nchan)

    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)
    ref = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
    fast = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True)
    )
    slow = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True,
                         chan_invariant=False)
    )
    assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)
    assert_allclose(slow, ref, rtol=1e-5, atol=1e-6)


def test_beam_cube_dde_pallas_out_of_cube_freqs(rng, beam_setup):
    """Frequencies outside the cube scale the lm coordinates instead of
    extrapolating (freq_grid_interp semantics) — the general pallas path
    must reproduce the XLA gathers there too (the chan-invariant fast
    path correctly refuses: scale != 1)."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 3, 2, 3, 5
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    pe = np.zeros((ntime, nants, nchan, 2))
    ascale = np.ones((nants, nchan, 2))
    # below, inside, above the cube's frequency range
    freq = np.array([0.5e9, 1.0e9, 1.3e9, 1.6e9, 2.2e9])

    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)
    ref = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
    got = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True)
    )
    assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_freq_grid_interp_reference_vectors():
    """The reference's exact corner-case vectors (ref
    rime/tests/test_fast_beams.py:130-151): out-of-range frequencies
    scale the lm coordinates and clamp to the edge slabs; on-grid
    frequencies carry unit/zero lower weights."""
    from numpy.testing import assert_array_almost_equal, assert_array_equal

    from africanus_tpu.rime.fast_beam_cubes import freq_grid_interp

    freqs = np.array([0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1])
    fmap = np.array([0.5, 0.56, 0.7, 0.91, 1.0])
    fd = np.asarray(freq_grid_interp(freqs, fmap))

    assert_array_almost_equal(
        fd[:, 0], [0.8, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.1]
    )
    assert_array_equal(fd[:, 2].astype(np.int32),
                       [0, 0, 1, 2, 2, 2, 3, 3])
    assert_array_almost_equal(
        fd[:, 1],
        [1.0, 1.0, 0.71428571, 1.0, 0.52380952, 0.04761905, 0.0, 0.0],
    )


def test_beam_cube_dde_pen_and_paper(rng):
    """2x2x2 single-corr cube, one source at (0.1, 0.1): the DDE equals
    the hand-computed trilinear + amplitude-normalised sum, including
    the reference's golden value (ref test_fast_beam_small,
    rime/tests/test_fast_beams.py:43-127)."""
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde

    np.random.seed(42)
    beam = (np.random.random((2, 2, 2, 1))
            + 1j * np.random.random((2, 2, 2, 1)))
    freq = np.array([0.3])
    fmap = np.array([0.0, 1.0])
    extents = np.array([[-1.0, 1.0], [-1.0, 1.0]])
    lm = np.array([[0.1, 0.1]])

    ddes = np.asarray(
        beam_cube_dde(
            beam, extents, fmap, lm,
            np.zeros((1, 1)), np.zeros((1, 1, 1, 2)),
            np.ones((1, 1, 2)), freq,
        )
    )

    ld = (lm[0, 0] - extents[0, 0]) / (extents[0, 1] - extents[0, 0])
    md = (lm[0, 1] - extents[1, 0]) / (extents[1, 1] - extents[1, 0])
    chd = freq[0]
    acc = 0.0
    aabs = 0.0
    for (gl, wl) in ((0, 1 - ld), (1, ld)):
        for (gm, wm) in ((0, 1 - md), (1, md)):
            for (gc, wc) in ((0, 1 - chd), (1, chd)):
                w = wl * wm * wc
                acc = acc + w * beam[gl, gm, gc, 0]
                aabs = aabs + w * np.abs(beam[gl, gm, gc, 0])
    want = acc * (aabs / np.abs(acc))

    assert_allclose(ddes.squeeze(), want, rtol=1e-6)
    # the reference's golden number for this seed
    assert_allclose(ddes.squeeze(), 0.470255 + 0.4786j, atol=1e-6)


def test_beam_cube_dde_fr_fused_matches_composition(rng, beam_setup):
    """beam_cube_dde_fr_ri (fused E·F) equals beam_cube_dde_ri followed
    by an explicit feed-rotation 2x2 product — on the XLA path AND on
    the Pallas chan-invariant path (interpret), for both feed types."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import (
        beam_cube_dde_fr_ri, beam_cube_dde_ri)
    from africanus_tpu.rime.feeds import feed_rotation_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 3, 2, 3, 6
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    pe = np.zeros((ntime, nants, nchan, 2))
    ascale = np.ones((nants, nchan, 2))
    freq = np.linspace(freq_map[0], freq_map[-1], nchan)
    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)

    for feed_type in ("linear", "circular"):
        e = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
        f = to_numpy(feed_rotation_ri(pa, feed_type))
        want = np.einsum("stafij,tajk->stafik",
                         e.reshape(nsrc, ntime, nants, nchan, 2, 2), f)
        got_xla = to_numpy(
            beam_cube_dde_fr_ri(*args, feed_type=feed_type,
                                use_pallas=False)
        ).reshape(want.shape)
        assert_allclose(got_xla, want, rtol=1e-5, atol=1e-6)
        got_fused = to_numpy(
            beam_cube_dde_fr_ri(*args, feed_type=feed_type,
                                use_pallas=True, interpret=True)
        ).reshape(want.shape)
        assert_allclose(got_fused, want, rtol=1e-5, atol=1e-6)


def test_beam_cube_dde_fr_general_path_applies_feed(rng, beam_setup):
    """Per-chan pointing errors force the general (non-chan-invariant)
    path; the feed product must still be applied there."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import (
        beam_cube_dde_fr_ri, beam_cube_dde_ri)
    from africanus_tpu.rime.feeds import feed_rotation_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 2, 2, 2, 4
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    pe = rng.normal(scale=1e-4, size=(ntime, nants, nchan, 2))
    ascale = np.ones((nants, nchan, 2))
    freq = np.linspace(freq_map[0], freq_map[-1], nchan)
    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)

    e = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
    f = to_numpy(feed_rotation_ri(pa, "linear"))
    want = np.einsum("stafij,tajk->stafik",
                     e.reshape(nsrc, ntime, nants, nchan, 2, 2), f)
    got = to_numpy(
        beam_cube_dde_fr_ri(*args, use_pallas=True, interpret=True,
                            chan_invariant=False, cell_residual=False)
    ).reshape(want.shape)
    assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got_np = to_numpy(
        beam_cube_dde_fr_ri(*args, use_pallas=False)
    ).reshape(want.shape)
    assert_allclose(got_np, want, rtol=1e-5, atol=1e-6)


def test_beam_cube_dde_cell_residual_matches_general(rng, beam_setup):
    """The cell-residual fast path (4-corner interpolation + exact
    per-channel in-cell reconstruction in the fused epilogue) must
    match the general per-channel path and the XLA 8-gather oracle
    when every sample's channels stay inside one cube cell — the
    realistic per-channel pointing-error regime (errors << cell)."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 4, 2, 3, 6
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    # per-channel pointing errors and scalings, small vs the ~4.4e-3 rad
    # cube cell so channels share a cell
    pe = rng.normal(scale=2e-6, size=(ntime, nants, nchan, 2))
    ascale = 1.0 + rng.normal(scale=1e-6, size=(nants, nchan, 2))
    freq = np.linspace(freq_map[0], freq_map[-1], nchan)
    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)

    ref = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
    cell = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True,
                         cell_residual=True)
    )
    auto = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True)
    )
    general = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True,
                         cell_residual=False)
    )
    assert_allclose(cell, ref, rtol=1e-5, atol=1e-6)
    assert_allclose(auto, ref, rtol=1e-5, atol=1e-6)
    assert_allclose(general, ref, rtol=1e-5, atol=1e-6)
    # the auto-detection must have picked the cell path here: its f32
    # rounding pattern equals the explicit cell_residual=True call
    assert_allclose(auto, cell, rtol=0, atol=0)


def test_beam_cube_dde_cell_residual_detection_falls_back(rng, beam_setup):
    """Cell-straddling per-channel coordinates (large pointing errors /
    out-of-cube frequency scaling) must NOT auto-select the
    cell-residual path — the general path's result is the contract."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 3, 2, 3, 5
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    # errors comparable to the cell size: channels straddle cells
    pe = rng.normal(scale=5e-3, size=(ntime, nants, nchan, 2))
    ascale = np.ones((nants, nchan, 2))
    freq = np.linspace(freq_map[0], freq_map[-1], nchan)
    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)

    ref = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
    auto = to_numpy(
        beam_cube_dde_ri(*args, use_pallas=True, interpret=True)
    )
    assert_allclose(auto, ref, rtol=1e-5, atol=1e-6)


def test_beam_cube_dde_fr_cell_residual_applies_feed(rng, beam_setup):
    """The fused feed rotation must ride the cell-residual epilogue:
    beam_cube_dde_fr_ri on the cell path equals the explicit E then
    F composition."""
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.fast_beam_cubes import (
        beam_cube_dde_fr_ri, beam_cube_dde_ri)
    from africanus_tpu.rime.feeds import feed_rotation_ri

    beam, extents, freq_map = beam_setup
    nsrc, ntime, nants, nchan = 3, 2, 2, 5
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2))
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants))
    pe = rng.normal(scale=2e-6, size=(ntime, nants, nchan, 2))
    ascale = np.ones((nants, nchan, 2))
    freq = np.linspace(freq_map[0], freq_map[-1], nchan)
    args = (beam, extents, freq_map, lm, pa, pe, ascale, freq)

    e = to_numpy(beam_cube_dde_ri(*args, use_pallas=False))
    f = to_numpy(feed_rotation_ri(pa, "linear"))
    want = np.einsum("stafij,tajk->stafik",
                     e.reshape(nsrc, ntime, nants, nchan, 2, 2), f)
    got = to_numpy(
        beam_cube_dde_fr_ri(*args, use_pallas=True, interpret=True,
                            cell_residual=True)
    ).reshape(want.shape)
    assert_allclose(got, want, rtol=1e-5, atol=1e-6)
