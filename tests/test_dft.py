"""DFT parity vs literal numpy oracles of the reference math
(dft/kernels.py:15-148), plus adjointness and sharding invariance."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.dft import im_to_vis, im_to_vis_ri, vis_to_im

C = 2.99792458e8
TWO_PI_OVER_C = 2.0 * np.pi / C


def np_im_to_vis(image, uvw, lm, frequency, convention="fourier"):
    constant = -TWO_PI_OVER_C if convention == "fourier" else TWO_PI_OVER_C
    nrow, nsrc, nchan, ncorr = (
        uvw.shape[0],
        lm.shape[0],
        frequency.shape[0],
        image.shape[-1],
    )
    vis = np.zeros((nrow, nchan, ncorr), np.complex128)
    for r in range(nrow):
        u, v, w = uvw[r]
        for s in range(nsrc):
            l, m = lm[s]
            n = np.sqrt(1.0 - l**2 - m**2) - 1.0
            real_phase = constant * (l * u + m * v + n * w)
            for nu in range(nchan):
                p = real_phase * frequency[nu] * 1.0j
                vis[r, nu] += np.exp(p) * image[s, nu]
    return vis


def np_vis_to_im(vis, uvw, lm, frequency, flags, convention="fourier"):
    constant = TWO_PI_OVER_C if convention == "fourier" else -TWO_PI_OVER_C
    nrow, nsrc, nchan, ncorr = (
        uvw.shape[0],
        lm.shape[0],
        frequency.shape[0],
        vis.shape[-1],
    )
    im = np.zeros((nsrc, nchan, ncorr), np.float64)
    for s in range(nsrc):
        l, m = lm[s]
        n = np.sqrt(1.0 - l**2 - m**2) - 1.0
        for r in range(nrow):
            u, v, w = uvw[r]
            real_phase = constant * (l * u + m * v + n * w)
            for nu in range(nchan):
                if np.any(flags[r, nu]):
                    continue
                p = real_phase * frequency[nu]
                im[s, nu] += np.cos(p) * vis[r, nu].real - np.sin(p) * vis[r, nu].imag
    return im


@pytest.fixture
def dft_data(rng):
    nsrc, nrow, nchan, ncorr = 6, 21, 8, 2
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2))
    uvw = rng.uniform(-800.0, 800.0, (nrow, 3))
    freq = np.linspace(0.856e9, 1.712e9, nchan)
    image = rng.normal(size=(nsrc, nchan, ncorr))
    return lm, uvw, freq, image


@pytest.mark.parametrize("convention", ["fourier", "casa"])
def test_im_to_vis_parity(dft_data, convention):
    lm, uvw, freq, image = dft_data
    out = np.asarray(im_to_vis(image, uvw, lm, freq, convention=convention))
    expected = np_im_to_vis(image, uvw, lm, freq, convention=convention)
    assert out.dtype == np.complex128
    assert_allclose(out, expected, rtol=1e-9, atol=1e-10)


def test_vis_to_im_parity(rng, dft_data):
    lm, uvw, freq, _ = dft_data
    nrow, nchan, ncorr = uvw.shape[0], freq.shape[0], 2
    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    flags = rng.uniform(size=(nrow, nchan, ncorr)) < 0.2

    out = np.asarray(vis_to_im(vis, uvw, lm, freq, flags))
    expected = np_vis_to_im(vis, uvw, lm, freq, flags)
    assert out.dtype == np.float64
    assert_allclose(out, expected, rtol=1e-9, atol=1e-9)


def test_dft_adjointness(rng, dft_data):
    """<F I, V> == <I, F^H V> — the reference validates im_to_vis/vis_to_im
    as an adjoint pair the same way (dft tests)."""
    lm, uvw, freq, image = dft_data
    nrow, nchan, ncorr = uvw.shape[0], freq.shape[0], image.shape[-1]
    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    flags = np.zeros((nrow, nchan, ncorr), bool)

    FI = np.asarray(im_to_vis(image, uvw, lm, freq))
    FHV = np.asarray(vis_to_im(vis, uvw, lm, freq, flags))

    lhs = np.vdot(vis, FI).real
    rhs = np.sum(image * FHV)
    assert_allclose(lhs, rhs, rtol=1e-9)


def test_im_to_vis_row_shard_invariance(dft_data):
    """Sharding rows over a device mesh must not change results —
    the TPU analogue of the reference's chunking-invariance dask tests."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    lm, uvw, freq, image = dft_data
    expected = np.asarray(im_to_vis(image, uvw, lm, freq))

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:7]).reshape(7), ("row",))
    uvw_s = jax.device_put(uvw, NamedSharding(mesh, P("row", None)))
    out = np.asarray(im_to_vis(image, uvw_s, lm, freq))
    assert_allclose(out, expected, rtol=1e-9, atol=1e-10)


def test_im_to_vis_pallas_matches_einsum(rng):
    """The Pallas-kernel DFT route (interpret mode) must match the MXU
    einsum formulation at f32."""
    import jax

    nsrc, nrow, nchan, ncorr = 12, 40, 10, 2
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(np.float32)
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(np.float32)
    freq = np.linspace(0.856e9, 1.712e9, nchan).astype(np.float32)
    image = rng.uniform(0.1, 1.0, (nsrc, nchan, ncorr)).astype(np.float32)

    ref = im_to_vis_ri(image, uvw, lm, freq, use_pallas=False)
    got = im_to_vis_ri(image, uvw, lm, freq, use_pallas=True,
                       interpret=True)
    scale = np.abs(np.asarray(ref.re)).max()
    assert np.abs(np.asarray(got.re) - np.asarray(ref.re)).max() < 3e-6 * scale
    assert np.abs(np.asarray(got.im) - np.asarray(ref.im)).max() < 3e-6 * scale


def test_vis_to_im_pallas_matches_einsum(rng):
    """The role-swapped Pallas route for the adjoint DFT (interpret
    mode) must match the einsum formulation at f32, including the
    whole-cell flag exclusion."""
    from africanus_tpu.dft import vis_to_im_ri

    nsrc, nrow, nchan, ncorr = 9, 24, 6, 2
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(np.float32)
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(np.float32)
    freq = np.linspace(0.856e9, 1.712e9, nchan).astype(np.float32)
    vis = (rng.normal(size=(nrow, nchan, ncorr))
           + 1j * rng.normal(size=(nrow, nchan, ncorr))).astype(np.complex64)
    flags = rng.uniform(size=vis.shape) < 0.2

    ref = np.asarray(vis_to_im_ri(vis, uvw, lm, freq, flags,
                                  use_pallas=False))
    got = np.asarray(vis_to_im_ri(vis, uvw, lm, freq, flags,
                                  use_pallas=True, interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 3e-6 * scale


def test_im_to_vis_phase_centre():
    """A single source at the phase centre returns its flux with zero
    imaginary part at every uv point (reference test_dft.py:12-41)."""
    from africanus_tpu.dft import im_to_vis

    rng = np.random.default_rng(1)
    nrow, npix, nchan, ncorr = 100, 35, 11, 2
    uvw = rng.uniform(size=(nrow, 3))
    x = np.linspace(-0.1, 0.1, npix)
    ll, mm = np.meshgrid(x, x)
    lm = np.vstack((ll.ravel(), mm.ravel())).T
    frequency = np.linspace(1.0, 2.0, nchan)
    inu = 1.0 * (frequency / frequency[nchan // 2]) ** -0.7
    image = np.zeros((npix, npix, nchan, ncorr))
    image[npix // 2, npix // 2] = inu[:, None]
    image = image.reshape(npix * npix, nchan, ncorr)

    vis = np.asarray(im_to_vis(image, uvw, lm, frequency))
    assert np.abs(vis.real - inu[None, :, None]).max() < 1e-12
    assert np.abs(vis.imag).max() < 1e-12


@pytest.mark.parametrize("convention", ["fourier", "casa"])
def test_im_to_vis_fft_oracle(convention):
    """DFT on a regular uv grid with w=0 equals the 2D FFT of the image,
    conjugated under the casa convention (reference test_dft.py:87-133)."""
    from africanus_tpu.constants import c as lightspeed
    from africanus_tpu.dft import im_to_vis

    rng = np.random.default_rng(123)
    npix, nsource = 29, 25
    image2d = np.zeros((npix, npix))
    ix = rng.integers(5, npix - 5, nsource)
    iy = rng.integers(5, npix - 5, nsource)
    image2d[ix, iy] = rng.normal(size=nsource)
    Fs, iFs = np.fft.fftshift, np.fft.ifftshift
    fft_image = Fs(np.fft.fft2(iFs(image2d)))

    deltal = 0.001
    l_coord = np.arange(-(npix // 2), npix // 2 + 1) * deltal
    ll, mm = np.meshgrid(l_coord, l_coord)
    lm = np.vstack((ll.ravel(), mm.ravel())).T
    u = Fs(np.fft.fftfreq(npix, d=deltal))
    uu, vv = np.meshgrid(u, u)
    uvw = np.zeros((npix * npix, 3))
    uvw[:, 0] = uu.ravel()
    uvw[:, 1] = vv.ravel()
    frequency = np.array([lightspeed])

    vis = np.asarray(
        im_to_vis(image2d.reshape(npix * npix, 1, 1), uvw, lm, frequency,
                  convention=convention)
    ).reshape(npix, npix)
    want = np.conj(fft_image) if convention == "casa" else fft_image
    assert_allclose(vis, want, rtol=0, atol=1e-12)


def test_vis_to_im_flagged():
    """Flags zero contributions: with all rows flagged except a unit-vis
    zero-uvw row, the image is exactly one everywhere (reference
    test_dft.py:180-216; note the reference's flag convention is
    INVERTED — flag==1 means use)."""
    from africanus_tpu.constants import c as lightspeed
    from africanus_tpu.dft import vis_to_im

    rng = np.random.default_rng(123)
    nsource, nrow, nchan, ncorr = 21, 31, 3, 4
    uvw = 100 * rng.uniform(size=(nrow, 3))
    uvw[0] = 0.0
    lm = 0.01 * rng.standard_normal((nsource, 2))
    vis = (rng.standard_normal((nrow, nchan, ncorr))
           + 1j * rng.standard_normal((nrow, nchan, ncorr)))
    vis[0] = 1.0
    flags = np.ones((nrow, nchan, ncorr), bool)
    flags[0] = 0
    frequency = np.full(nchan, lightspeed)

    img = np.asarray(vis_to_im(vis, uvw, lm, frequency, flags))
    assert_allclose(img, np.ones((nsource, nchan, ncorr)), rtol=0,
                    atol=1e-12)


def test_symmetric_covariance():
    """The image-plane normal matrix Rᴴ R sampled at source positions is
    symmetric (reference test_dft.py:297-331)."""
    from africanus_tpu.dft import im_to_vis, vis_to_im

    rng = np.random.default_rng(123)
    nsource, nrows = 25, 500
    lm = rng.uniform(-0.05, 0.05, (nsource, 2))
    uvw = rng.standard_normal((nrows, 3)) * 1000
    uvw[:, 2] = 0.0
    freq = np.array([1.0e9])
    flags = np.zeros((nrows, 1, 1), bool)

    psf = np.zeros((nsource, nsource))
    point = np.ones((1, 1, 1))
    for s in range(nsource):
        Ki = np.asarray(im_to_vis(point, uvw, lm[s : s + 1], freq))
        psf[:, s] = np.asarray(
            vis_to_im(Ki, uvw, lm, freq, flags)
        ).squeeze()
    assert_allclose(psf, psf.T, rtol=0, atol=1e-9 * np.abs(psf).max())



def _mode_freq(grid, nchan, rng):
    """A frequency grid engaging the requested pallas_dft mode."""
    if grid == "exact":
        # f64 progression: carried as two-float pairs, recurrence exact
        return np.linspace(0.856e9, 1.2e9, nchan)
    if grid == "residual":
        # uniform-intent grid stored in f32: per-channel ulp wobble
        # (≤ ~128 Hz) vs the fitted progression
        return np.linspace(0.856e9, 1.2e9, nchan).astype(np.float32)
    # genuinely non-uniform
    return (0.8e9 + np.sort(rng.uniform(0, 1e9, nchan))).astype(np.float32)


@pytest.mark.parametrize(
    "nrow,nchan,ncorr,grid",
    [(300, 4, 2, "exact"), (300, 16, 2, "residual"),
     (257, 3, 1, "direct"), (64, 1, 4, "exact"),
     (120, 12, 2, "residual"), (120, 12, 2, "direct")],
)
def test_vis_to_im_pallas_chan_groups(rng, nrow, nchan, ncorr, grid):
    """The pixel-lane adjoint kernel (ops/pallas_dft.py) across its
    channel-group split and all three phase modes (exact/residual
    rotation recurrence, per-channel direct), vs the f64 einsum
    formulation on identical frequency values."""
    import jax.numpy as jnp
    from africanus_tpu.dft import vis_to_im_ri
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.ops.pallas_dft import _chan_group_tables

    f32 = np.float32
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(f32)
    freq = _mode_freq(grid, nchan, rng)
    if nchan >= 2:  # the intended mode must actually engage
        assert _chan_group_tables(freq, nchan, ncorr, cap=8)[2] == grid
    npx = 9
    lm = rng.uniform(-0.01, 0.01, (npx * npx, 2)).astype(f32)
    vis = Cplx(rng.normal(size=(nrow, nchan, ncorr)).astype(f32),
               rng.normal(size=(nrow, nchan, ncorr)).astype(f32))
    flags = rng.uniform(size=(nrow, nchan, ncorr)) < 0.1

    # f64 oracle on the same (exactly upcast) frequency values
    ref = np.asarray(vis_to_im_ri(
        Cplx(vis.re.astype(np.float64), vis.im.astype(np.float64)),
        uvw.astype(np.float64), lm.astype(np.float64),
        np.asarray(freq, np.float64), flags,
        use_pallas=False, real_dtype=jnp.float64))
    got = np.asarray(vis_to_im_ri(vis, uvw, lm, freq, flags,
                                  use_pallas=True, interpret=True,
                                  real_dtype=jnp.float32))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 3e-6 * scale


@pytest.mark.parametrize(
    "nrow,nchan,ncorr,grid,complex_image",
    [(130, 4, 2, "exact", False), (257, 3, 1, "direct", True),
     (64, 1, 4, "exact", False), (140, 16, 2, "residual", True),
     (120, 12, 1, "residual", False), (120, 12, 1, "direct", False)],
)
def test_im_to_vis_pallas_forward(rng, nrow, nchan, ncorr, grid,
                                  complex_image):
    """The row-lane forward kernel (ops/pallas_dft.dft_forward_pallas)
    across channel groups, the three phase modes and the real-image
    fast path, vs the f64 einsum formulation."""
    import jax.numpy as jnp
    from africanus_tpu.dft import im_to_vis_ri
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.ops.pallas_dft import _chan_group_tables

    f32 = np.float32
    nsrc = 37
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(f32)
    freq = _mode_freq(grid, nchan, rng)
    if nchan >= 2:
        assert _chan_group_tables(freq, nchan, ncorr, cap=4)[2] == grid
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(f32)
    im_im = (rng.normal(size=(nsrc, nchan, ncorr)).astype(f32)
             if complex_image else np.zeros((nsrc, nchan, ncorr), f32))
    img = Cplx(rng.normal(size=(nsrc, nchan, ncorr)).astype(f32), im_im)

    ref = im_to_vis_ri(
        Cplx(img.re.astype(np.float64), img.im.astype(np.float64)),
        uvw.astype(np.float64), lm.astype(np.float64),
        np.asarray(freq, np.float64),
        use_pallas=False, real_dtype=jnp.float64)
    got = im_to_vis_ri(img, uvw, lm, freq, use_pallas=True,
                       interpret=True, real_dtype=jnp.float32)
    scale = max(np.abs(np.asarray(ref.re)).max(),
                np.abs(np.asarray(ref.im)).max())
    err = max(np.abs(np.asarray(got.re) - np.asarray(ref.re)).max(),
              np.abs(np.asarray(got.im) - np.asarray(ref.im)).max())
    assert err < 3e-6 * scale


def test_im_to_vis_pallas_traced_freq(rng):
    """Traced (jit-argument) frequencies must fall back to the direct
    mode and stay correct — the recurrence needs concrete values."""
    import jax
    import jax.numpy as jnp
    from africanus_tpu.dft import im_to_vis_ri
    from africanus_tpu.ops.cplx import Cplx

    f32 = np.float32
    nsrc, nrow, nchan, ncorr = 21, 90, 4, 1
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(f32)
    freq = np.linspace(0.856e9, 1.2e9, nchan).astype(f32)
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(f32)
    img = Cplx(rng.normal(size=(nsrc, nchan, ncorr)).astype(f32),
               np.zeros((nsrc, nchan, ncorr), f32))

    ref = im_to_vis_ri(img, uvw, lm, freq, use_pallas=False,
                       real_dtype=jnp.float32)
    got = jax.jit(lambda i, u, l, f: im_to_vis_ri(
        i, u, l, f, use_pallas=True, interpret=True,
        real_dtype=jnp.float32))(img, uvw, lm, freq)
    scale = np.abs(np.asarray(ref.re)).max()
    err = max(np.abs(np.asarray(got.re) - np.asarray(ref.re)).max(),
              np.abs(np.asarray(got.im) - np.asarray(ref.im)).max())
    assert err < 3e-6 * scale


def test_pallas_dft_tile_rounding(rng):
    """Non-multiple-of-8 row/src tiles are rounded up, not silently
    truncated (regression: row_tile=12 dropped 4 of every 12 rows)."""
    import jax.numpy as jnp
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.ops.pallas_dft import (
        dft_adjoint_pallas, dft_forward_pallas)
    from africanus_tpu.rime.phase import phase_dot_cycles

    f32 = np.float32
    nrow, nchan, ncorr, npx = 48, 2, 1, 9
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(f32)
    freq = np.linspace(0.9e9, 1.0e9, nchan)
    lm = rng.uniform(-0.01, 0.01, (npx, 2)).astype(f32)
    vis = Cplx(rng.normal(size=(nrow, nchan, ncorr)).astype(f32),
               rng.normal(size=(nrow, nchan, ncorr)).astype(f32))

    dhi, dlo = phase_dot_cycles(lm, uvw, "casa")
    ref = np.asarray(dft_adjoint_pallas((dhi.T, dlo.T), freq, vis,
                                        interpret=True))
    got = np.asarray(dft_adjoint_pallas((dhi.T, dlo.T), freq, vis,
                                        row_tile=12, interpret=True))
    assert np.abs(got - ref).max() < 1e-6 * np.abs(ref).max()

    img = Cplx(rng.normal(size=(npx, nchan, ncorr)).astype(f32),
               np.zeros((npx, nchan, ncorr), f32))
    fr = dft_forward_pallas((dhi, dlo), freq, img, interpret=True)
    fg = dft_forward_pallas((dhi, dlo), freq, img, src_tile=12,
                            interpret=True)
    assert np.abs(np.asarray(fg.re) - np.asarray(fr.re)).max() \
        < 1e-6 * np.abs(np.asarray(fr.re)).max()


def test_residual_mode_delay_bound():
    """Residual-mode engagement respects the delay bound: a grid with
    ~f32-ulp wobble engages at SKA-scale delays but falls back to the
    always-correct direct mode when the caller's delays would push the
    small-angle polynomial out of its validity envelope."""
    from africanus_tpu.ops.pallas_dft import _chan_group_tables

    freq = np.linspace(0.856e9, 1.2e9, 16).astype(np.float32)
    assert _chan_group_tables(freq, 16, 2, cap=8)[2] == "residual"
    # VLBI-scale delays (~4e-2 s): 2π·δ·delay ≫ 0.35 rad → direct
    assert _chan_group_tables(freq, 16, 2, cap=8,
                              delay_max=4e-2)[2] == "direct"
    # exact f64 progressions stay exact regardless of delays
    assert _chan_group_tables(freq.astype(np.float64) * 0 +
                              np.linspace(1e9, 2e9, 16), 16, 2, cap=8,
                              delay_max=4e-2)[2] == "exact"


def test_pallas_dft_vs_literal_numpy_oracle(rng):
    """Independent literal-loop oracle (reference dft/kernels.py:24-148
    semantics, written from the formula — shares no code with the
    library's phase pipeline) for both fused kernels."""
    import jax.numpy as jnp
    from africanus_tpu.dft import im_to_vis_ri, vis_to_im_ri
    from africanus_tpu.ops.cplx import Cplx

    C = 2.99792458e8
    f32 = np.float32
    nsrc, nrow, nchan, ncorr = 5, 40, 4, 2
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(f32)
    freq = np.linspace(0.856e9, 1.2e9, nchan)  # f64 → exact mode
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(f32)
    img = rng.normal(size=(nsrc, nchan, ncorr)).astype(f32)
    vis = Cplx(rng.normal(size=(nrow, nchan, ncorr)).astype(f32),
               rng.normal(size=(nrow, nchan, ncorr)).astype(f32))
    flags = np.zeros((nrow, nchan, ncorr), bool)

    # literal triple loops, f64 ("fourier" convention: e^{-2πi...})
    want_v = np.zeros((nrow, nchan, ncorr), complex)
    want_i = np.zeros((nsrc, nchan, ncorr))
    for s in range(nsrc):
        l, m = np.float64(lm[s, 0]), np.float64(lm[s, 1])
        n = np.sqrt(1.0 - l * l - m * m)
        for r in range(nrow):
            u, v_, w = uvw[r].astype(np.float64)
            dot = u * l + v_ * m + w * (n - 1.0)
            for f in range(nchan):
                p = -2.0 * np.pi * dot * freq[f] / C
                K = np.cos(p) + 1j * np.sin(p)
                for c in range(ncorr):
                    want_v[r, f, c] += K * img[s, f, c]
                    vv = vis.re[r, f, c] + 1j * vis.im[r, f, c]
                    want_i[s, f, c] += np.real(np.conj(K) * vv)

    got_v = im_to_vis_ri(img, uvw, lm, freq, use_pallas=True,
                         interpret=True, real_dtype=jnp.float32)
    err_v = max(
        np.abs(np.asarray(got_v.re) - want_v.real).max(),
        np.abs(np.asarray(got_v.im) - want_v.imag).max(),
    ) / np.abs(want_v).max()
    assert err_v < 3e-6

    got_i = np.asarray(vis_to_im_ri(vis, uvw, lm, freq, flags,
                                    use_pallas=True, interpret=True,
                                    real_dtype=jnp.float32))
    assert np.abs(got_i - want_i).max() < 3e-6 * np.abs(want_i).max()


def test_pallas_dft_empty_inputs(rng):
    """Empty row/source selections return zeros like the einsum path
    (regression: the tile BlockSpec crashed at trace time)."""
    import jax.numpy as jnp
    from africanus_tpu.dft import im_to_vis_ri, vis_to_im_ri
    from africanus_tpu.ops.cplx import Cplx

    f32 = np.float32
    freq = np.linspace(0.9e9, 1.0e9, 3)
    lm = rng.uniform(-0.01, 0.01, (7, 2)).astype(f32)

    # zero rows, adjoint
    out = vis_to_im_ri(
        Cplx(np.zeros((0, 3, 2), f32), np.zeros((0, 3, 2), f32)),
        np.zeros((0, 3), f32), lm, freq, np.zeros((0, 3, 2), bool),
        use_pallas=True, interpret=True, real_dtype=jnp.float32)
    assert out.shape == (7, 3, 2) and not np.any(np.asarray(out))

    # zero sources, forward
    out = im_to_vis_ri(
        np.zeros((0, 3, 1), f32), rng.uniform(-10, 10, (9, 3)).astype(f32),
        np.zeros((0, 2), f32), freq, use_pallas=True, interpret=True,
        real_dtype=jnp.float32)
    assert out.re.shape == (9, 3, 1) and not np.any(np.asarray(out.re))


def test_recurrence_engages_under_jit(rng, monkeypatch):
    """Closed-over concrete frequency grids must reach the kernels
    un-coerced so the recurrence modes engage inside jit (regression:
    the wrappers' jnp.asarray turned them into constant tracers and
    every jitted call fell back to the direct mode)."""
    import jax
    import jax.numpy as jnp
    from africanus_tpu import dft
    from africanus_tpu.ops import pallas_dft

    modes = []
    orig = pallas_dft._chan_group_tables

    def spy(freq, nchan, ncorr, cap, **kw):
        out = orig(freq, nchan, ncorr, cap, **kw)
        modes.append(out[2])
        return out

    monkeypatch.setattr(pallas_dft, "_chan_group_tables", spy)

    f32 = np.float32
    freq = np.linspace(0.856e9, 1.2e9, 8)  # f64 numpy → exact
    uvw = rng.uniform(-2000, 2000, (24, 3)).astype(f32)
    lm = rng.uniform(-0.01, 0.01, (5, 2)).astype(f32)
    img = rng.normal(size=(5, 8, 1)).astype(f32)

    jax.jit(lambda i, u, l: dft.im_to_vis_ri(
        i, u, l, freq, use_pallas=True, interpret=True,
        real_dtype=jnp.float32))(img, uvw, lm)
    assert modes[-1] == "exact"

    vis = pallas_dft.Cplx(rng.normal(size=(24, 8, 1)).astype(f32),
                          rng.normal(size=(24, 8, 1)).astype(f32))
    flags = np.zeros((24, 8, 1), bool)
    jax.jit(lambda v, u, l, fl: dft.vis_to_im_ri(
        v, u, l, freq, fl, use_pallas=True, interpret=True,
        real_dtype=jnp.float32))(vis, uvw, lm, flags)
    assert modes[-1] == "exact"


def test_chan_group_tables_exact_gate_respects_delay_max():
    """The 'exact' recurrence gate must scale with the caller's delay
    bound: a grid with ~1e-3 Hz fit residuals is exactly-uniform at the
    1e-4 s default but must demote to 'residual' at a VLBI-scale
    delay_max (the dropped phase would otherwise exceed the error
    budget)."""
    from africanus_tpu.ops.pallas_dft import _chan_group_tables

    nchan = 64
    freq = np.linspace(1.4e9, 1.5e9, nchan)
    rng = np.random.default_rng(3)
    freq = freq + rng.uniform(-5e-4, 5e-4, nchan)  # ~sub-mHz residuals
    freq[0] = 1.4e9
    freq[-1] = 1.5e9

    cg, ng, mode_default, _, _, _ = _chan_group_tables(freq, nchan, 1, cap=4)
    cg, ng, mode_vlbi, _, _, _ = _chan_group_tables(
        freq, nchan, 1, cap=4, delay_max=0.05)
    assert mode_default == "exact"
    assert mode_vlbi == "residual"


@pytest.mark.parametrize("lane_tile,group_block", [(128, 1), (256, 2),
                                                   (512, 4), (None, None)])
def test_pallas_dft_block_policy_sweep(rng, lane_tile, group_block):
    """Explicit lane-tile / channel-group-block combinations (the
    per-grid-step widening knobs, ops/pallas_dft._pick_blocks) must all
    reproduce the f64 einsum result — forward and adjoint."""
    import jax.numpy as jnp
    from africanus_tpu.dft import im_to_vis_ri, vis_to_im_ri
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.ops.pallas_dft import (dft_adjoint_pallas,
                                              dft_forward_pallas)
    from africanus_tpu.rime.phase import phase_dot_cycles

    f32 = np.float32
    nsrc, nrow, nchan, ncorr = 23, 290, 16, 2  # cg=4 -> ngroups=4
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(f32)
    freq = np.linspace(0.856e9, 1.2e9, nchan)
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(f32)
    img = Cplx(rng.normal(size=(nsrc, nchan, ncorr)).astype(f32),
               rng.normal(size=(nsrc, nchan, ncorr)).astype(f32))

    ref = im_to_vis_ri(
        Cplx(img.re.astype(np.float64), img.im.astype(np.float64)),
        uvw.astype(np.float64), lm.astype(np.float64), freq,
        use_pallas=False, real_dtype=jnp.float64)
    dot = phase_dot_cycles(lm, uvw, "fourier")
    got = dft_forward_pallas(dot, freq, img, interpret=True,
                             lane_tile=lane_tile, group_block=group_block)
    scale = np.abs(np.asarray(ref.re)).max()
    err = max(np.abs(np.asarray(got.re) - np.asarray(ref.re)).max(),
              np.abs(np.asarray(got.im) - np.asarray(ref.im)).max())
    assert err < 3e-6 * scale

    vis = Cplx(rng.normal(size=(nrow, nchan, ncorr)).astype(f32),
               rng.normal(size=(nrow, nchan, ncorr)).astype(f32))
    flags = np.zeros((nrow, nchan, ncorr), bool)
    refa = np.asarray(vis_to_im_ri(
        Cplx(vis.re.astype(np.float64), vis.im.astype(np.float64)),
        uvw.astype(np.float64), lm.astype(np.float64), freq, flags,
        use_pallas=False, real_dtype=jnp.float64))
    dota = phase_dot_cycles(lm, uvw, "casa")
    gota = np.asarray(dft_adjoint_pallas(
        (dota[0].T, dota[1].T), freq, vis, interpret=True,
        lane_tile=lane_tile, group_block=group_block))
    assert np.abs(gota - refa).max() < 3e-6 * np.abs(refa).max()


def test_pallas_dft_group_block_must_divide():
    """An explicit group_block that does not divide ngroups raises."""
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.ops.pallas_dft import dft_forward_pallas

    freq = np.linspace(1e9, 1.1e9, 16)  # cg=4 -> ngroups=4
    dot = (np.zeros((8, 16), np.float32), np.zeros((8, 16), np.float32))
    img = Cplx(np.ones((8, 16, 1), np.float32),
               np.zeros((8, 16, 1), np.float32))
    with pytest.raises(ValueError, match="group_block"):
        dft_forward_pallas(dot, freq, img, interpret=True, group_block=3)
