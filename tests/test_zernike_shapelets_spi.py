"""Zernike DDE, shapelet, and SPI-fitter parity tests (reference:
rime/zernike.py, model/shape/shapelets.py, model/spi/component_spi.py)."""

import math

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.rime.zernike import zernike_dde, noll_to_zernike
from africanus_tpu.model.shape.shapelets import shapelet, shapelet_with_w_term
from africanus_tpu.model.spi.component_spi import fit_spi_components

C = 2.99792458e8


# ---------------- zernike oracle (literal reference port) -----------------


def np_zernike(j, rho, phi):
    if rho > 1:
        return 0.0
    j += 1
    n, j1 = 0, j - 1
    while j1 > n:
        n += 1
        j1 -= n
    m = (-1) ** j * ((n % 2) + 2 * int((j1 + ((n + 1) % 2)) / 2.0))
    am = abs(m)

    def rad(mm, nn, r):
        out = 0.0
        for k in range((nn - mm) // 2 + 1):
            num = (-1.0) ** k * math.factorial(nn - k)
            den = (
                math.factorial(k)
                * math.factorial((nn + mm) // 2 - k)
                * math.factorial((nn - mm) // 2 - k)
            )
            out += num / den * r ** (nn - 2.0 * k)
        return out

    if m > 0:
        return rad(am, n, rho) * np.cos(am * phi)
    if m < 0:
        return rad(am, n, rho) * np.sin(am * phi)
    return rad(0, n, rho)


def np_zernike_dde(coords, coeffs, noll_index, pa, fscale, ascale, pe):
    _, S, T, A, F = coords.shape
    corrs = coeffs.shape[2:-1]
    P = coeffs.shape[-1]
    nc = int(np.prod(corrs))
    cf = coeffs.reshape(A, F, nc, P)
    nl = noll_index.reshape(A, F, nc, P)
    out = np.empty((S, T, A, F, nc), coeffs.dtype)
    for s in range(S):
        for t in range(T):
            for a in range(A):
                sp, cp = np.sin(pa[t, a]), np.cos(pa[t, a])
                for f in range(F):
                    l, m, _ = coords[:, s, t, a, f]
                    lc = l * fscale[f] + pe[t, a, f, 0]
                    mc = m * fscale[f] + pe[t, a, f, 1]
                    vl = (lc * cp - lc * sp) * ascale[a, f, 0]
                    vm = (mc * sp + m * cp) * ascale[a, f, 1]
                    rho = np.hypot(vl, vm)
                    phi = np.arctan2(vl, vm)
                    for co in range(nc):
                        acc = 0.0
                        for p in range(P):
                            acc += cf[a, f, co, p] * np_zernike(
                                int(nl[a, f, co, p]), rho, phi
                            )
                        out[s, t, a, f, co] = acc
    return out.reshape((S, T, A, F) + corrs)


def test_noll_to_zernike():
    # first Noll indices (reference convention with its j+=1 offset:
    # j=0 is piston, j=1/2 the tilts)
    assert noll_to_zernike(0) == (0, 0)
    assert noll_to_zernike(1) == (1, 1)
    assert noll_to_zernike(2) == (1, -1)


def test_zernike_dde_parity(rng):
    S, T, A, F, P = 3, 2, 2, 4, 6
    lm = rng.uniform(-0.5, 0.5, (S, 2))
    freq = np.linspace(0.9e9, 1.2e9, F)
    coords = np.empty((3, S, T, A, F))
    coords[0] = lm[:, 0][:, None, None, None]
    coords[1] = lm[:, 1][:, None, None, None]
    coords[2] = freq[None, None, None, :]
    coeffs = rng.normal(size=(A, F, 2, 2, P)) + 1j * rng.normal(size=(A, F, 2, 2, P))
    noll = rng.integers(0, 10, size=(A, F, 2, 2, P))
    pa = rng.uniform(-np.pi, np.pi, (T, A))
    fscale = rng.uniform(0.9, 1.1, F)
    ascale = rng.uniform(0.9, 1.1, (A, F, 2))
    pe = rng.normal(scale=0.01, size=(T, A, F, 2))

    out = np.asarray(zernike_dde(coords, coeffs, noll, pa, fscale, ascale, pe))
    expected = np_zernike_dde(coords, coeffs, noll, pa, fscale, ascale, pe)
    assert out.shape == (S, T, A, F, 2, 2)
    assert_allclose(out, expected, rtol=1e-10, atol=1e-12)


# ---------------- shapelets oracle ----------------------------------------


def np_hermite(n, x):
    if n == 0:
        return np.ones_like(x) if isinstance(x, np.ndarray) else 1.0
    if n == 1:
        return 2 * x
    return 2 * x * np_hermite(n - 1, x) - 2 * (n - 1) * np_hermite(n - 2, x)


def np_basis(n, xx, beta, delta_x):
    x = 2 * np.pi * xx
    scale = 1.0 / beta
    norm = 1.0 / np.sqrt(2.0**n * np.sqrt(np.pi) * math.factorial(n) * scale)
    return (
        1.0j**n
        * norm
        * np_hermite(n, x / scale)
        * np.exp(-(x**2) / (2 * scale**2))
        * np.sqrt(2 * np.pi)
        / delta_x
    )


def np_shapelet(coords, freq, coeffs, beta, delta_lm):
    nrow, nchan, nsrc = coords.shape[0], freq.shape[0], coeffs.shape[0]
    out = np.empty((nrow, nchan, nsrc), np.complex128)
    dl, dm = delta_lm
    for r in range(nrow):
        u, v, _ = coords[r]
        for f in range(nchan):
            fu = u * 2 * np.pi * freq[f] / C
            fv = v * 2 * np.pi * freq[f] / C
            for s in range(nsrc):
                bu, bv = beta[s]
                if bu == 0 or bv == 0:
                    out[r, f, s] = 1
                    continue
                acc = 0j
                for n1 in range(coeffs.shape[1]):
                    for n2 in range(coeffs.shape[2]):
                        acc += (
                            coeffs[s, n1, n2]
                            * np_basis(n1, fu, bu, dl)
                            * np_basis(n2, fv, bv, dm)
                        )
                out[r, f, s] = acc
    return out


def test_shapelet_parity(rng):
    nrow, nchan, nsrc, nmax = 10, 4, 3, 3
    coords = rng.uniform(-500, 500, (nrow, 3))
    freq = np.linspace(1.0e9, 1.4e9, nchan)
    coeffs = rng.normal(size=(nsrc, nmax, nmax))
    beta = rng.uniform(0.5, 2.0, (nsrc, 2))
    beta[2] = 0.0  # degenerate source -> 1
    delta_lm = np.array([1e-5, 1e-5])

    out = np.asarray(shapelet(coords, freq, coeffs, beta, delta_lm))
    expected = np_shapelet(coords, freq, coeffs, beta, delta_lm)
    assert_allclose(out, expected, rtol=1e-9, atol=1e-11)


def test_shapelet_w_term(rng):
    nrow, nchan, nsrc, nmax = 6, 3, 2, 2
    coords = rng.uniform(-500, 500, (nrow, 3))
    freq = np.linspace(1.0e9, 1.4e9, nchan)
    coeffs = rng.normal(size=(nsrc, nmax, nmax))
    beta = rng.uniform(0.5, 2.0, (nsrc, 2))
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2))
    delta_lm = np.array([1e-5, 1e-5])

    base = np_shapelet(coords, freq, coeffs, beta, delta_lm)
    w_term = np.empty_like(base)
    for r in range(nrow):
        u, v, w = coords[r]
        for s in range(nsrc):
            l, m = lm[s]
            n0 = np.sqrt(1 - l * l - m * m)
            rp = -2 * np.pi / C * freq * (u * l + v * m + w * (n0 - 1))
            w_term[r, :, s] = np.exp(1j * rp)

    out = np.asarray(shapelet_with_w_term(coords, freq, coeffs, beta, delta_lm, lm))
    assert_allclose(out, base * w_term, rtol=1e-9, atol=1e-11)


# ---------------- SPI fitter -----------------------------------------------


def test_fit_spi_components(rng):
    ncomp, nchan = 8, 32
    freqs = np.linspace(0.856e9, 1.712e9, nchan)
    freq0 = 1.2e9
    alpha_true = rng.uniform(-1.2, -0.2, ncomp)
    i0_true = rng.uniform(0.5, 5.0, ncomp)
    data = i0_true[:, None] * (freqs / freq0) ** alpha_true[:, None]
    noise = 1e-6
    data = data + rng.normal(scale=noise, size=data.shape)
    weights = np.full(nchan, 1.0 / noise**2)

    out = np.asarray(fit_spi_components(data, weights, freqs, freq0, maxiter=200))
    assert out.shape == (4, ncomp)
    assert_allclose(out[0], alpha_true, atol=1e-4)
    assert_allclose(out[2], i0_true, rtol=1e-4)
    assert np.all(out[1] >= 0) and np.all(out[3] >= 0)

    with pytest.raises(ValueError, match="float32 or float64"):
        fit_spi_components(data.astype(np.int32), weights, freqs, freq0)


def test_zernike_orthogonality():
    """Mathematical oracle: Zernike polynomials are orthogonal over the
    unit disc with ∫ Z_i Z_j dA = π δ_ij / (2n+2) · (1 or 2 for m=0) —
    checked numerically on a fine grid for the first 10 Noll indices.
    This pins the basis itself (radial coefficients, Noll mapping,
    angular parity) to an external mathematical property rather than a
    transcribed table."""
    from africanus_tpu.rime.zernike import noll_to_zernike, zernike_basis

    n_grid = 601
    x = np.linspace(-1, 1, n_grid)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    rho = np.sqrt(xx**2 + yy**2)
    phi = np.arctan2(yy, xx)
    dA = (x[1] - x[0]) ** 2

    js = list(range(10))
    Z = [np.asarray(zernike_basis(j, rho, phi)) for j in js]

    for a in range(len(js)):
        for b in range(a, len(js)):
            integral = (Z[a] * Z[b]).sum() * dA
            if a == b:
                n, m = noll_to_zernike(js[a])
                eps = 2.0 if m == 0 else 1.0
                want = eps * np.pi / (2 * n + 2)
                assert abs(integral - want) < 3e-2 * max(want, 1e-3), (
                    js[a], integral, want
                )
            else:
                assert abs(integral) < 2e-2, (js[a], js[b], integral)


def test_shapelet_1d_fourier_duality():
    """The uv-space 1D shapelet equals the FFT of the signal-space
    shapelet on matched grids (reference test_1d_shapelet,
    model/shape/tests/test_shapelets.py:16-37)."""
    from africanus_tpu.model.shape import shapelet_1d

    beta = 1.0
    npix = 513
    coeffs = np.ones(1)
    l_min, l_max = -15.0 * beta, 15.0 * beta
    delta_l = (l_max - l_min) / (npix - 1)
    l_coords = l_min + np.arange(npix) * delta_l
    img = np.asarray(shapelet_1d(l_coords, coeffs, False, beta=beta))

    Fs, iFs = np.fft.fftshift, np.fft.ifftshift
    u = Fs(np.fft.fftfreq(npix, d=delta_l))
    fft_shape = Fs(np.fft.fft(iFs(img)))
    uv = np.asarray(shapelet_1d(u, coeffs, True, delta_x=delta_l,
                                beta=beta))
    assert_allclose(uv, fft_shape, rtol=0, atol=1e-8 * np.abs(fft_shape).max())


def test_shapelet_2d_separability():
    """The 2D shapelet visibility grid separates into the product of 1D
    fourier shapelets, and matches the FFT of the 2D image-space product
    (reference test_fourier_space_shapelets, test_shapelets.py:89-157)."""
    from africanus_tpu.constants import c as lightspeed
    from africanus_tpu.model.shape import shapelet, shapelet_1d

    beta_l = beta_m = 1.0
    scale_fact = 10.0
    l_min = -3 * np.sqrt(2) * beta_l * scale_fact
    l_max = 3 * np.sqrt(2) * beta_l * scale_fact
    npix = 257
    delta_l = (l_max - l_min) / (npix - 1)
    lvals = l_min + np.arange(npix) * delta_l

    ls = np.asarray(shapelet_1d(lvals, np.ones(1), False, beta=beta_l))
    img = np.outer(ls, ls)

    Fs, iFs = np.fft.fftshift, np.fft.ifftshift
    fft_shapelet = Fs(np.fft.fft2(iFs(img)))
    fft_shapelet /= fft_shapelet.real.max()

    freq_u = Fs(np.fft.fftfreq(npix, d=delta_l))
    uu, vv = np.meshgrid(freq_u, freq_u)
    uvw = np.zeros((npix * npix, 3))
    uvw[:, 0] = uu.ravel()
    uvw[:, 1] = vv.ravel()

    frequency = np.array([lightspeed / (2 * np.pi)])
    coeffs = np.ones((1, 1, 1))
    beta = np.array([[beta_l, beta_m]])
    uv_shape = np.array(
        shapelet(uvw, frequency, coeffs, beta, (delta_l, delta_l))
    ).reshape(npix, npix)
    uv_shape = uv_shape / uv_shape.real.max()

    assert_allclose(uv_shape, fft_shapelet, rtol=0, atol=1e-6)


def test_zernike_analytic_golden(rng):
    """Low-order Zernike basis functions against their closed forms
    (physics golden — any Noll-convention or radial-coefficient slip
    shows up immediately): piston, tilts, defocus, astigmatisms, comas,
    spherical."""
    from africanus_tpu.rime.zernike import zernike_basis

    rho = rng.uniform(0, 1, 200)
    phi = rng.uniform(-np.pi, np.pi, 200)
    x = rho * np.cos(phi)
    y = rho * np.sin(phi)

    # 0-based Noll j (the reference convention: j=0 piston) -> analytic
    # form (unnormalised radial convention: R_n^m directly, no
    # sqrt(2(n+1)) factor)
    golden = {
        0: np.ones_like(rho),                   # piston
        1: rho * np.cos(phi),                   # x tilt
        2: rho * np.sin(phi),                   # y tilt
        3: 2 * rho**2 - 1,                      # defocus
        4: rho**2 * np.sin(2 * phi),            # oblique astigmatism
        5: rho**2 * np.cos(2 * phi),            # vertical astigmatism
        6: (3 * rho**3 - 2 * rho) * np.sin(phi),   # vertical coma
        7: (3 * rho**3 - 2 * rho) * np.cos(phi),   # horizontal coma
        10: 6 * rho**4 - 6 * rho**2 + 1,        # primary spherical
    }
    for j, want in golden.items():
        got = np.asarray(zernike_basis(j, rho, phi))
        assert_allclose(got, want, rtol=0, atol=1e-12), j

    # and outside the unit disc the basis clamps to zero
    got = np.asarray(zernike_basis(3, np.array([1.5, 2.0]),
                                   np.array([0.1, 0.2])))
    assert_allclose(got, 0.0)
    del x, y


@pytest.mark.parametrize("base", ["std", "log", "log10"])
def test_spectral_model_explicit_polynomials(rng, base):
    """spectral_model against the reference's literal numpy oracle
    (reference spec_model.py:11-53): std multiplies (nu/nu0)**alpha_i per
    order; log/log10 bases exponentiate sums of alpha_i * log(nu/nu0)**(i+1),
    with I0 OUTSIDE the exponent."""
    from africanus_tpu.model.spectral import spectral_model

    nsrc, nord, nchan = 5, 3, 16
    stokes = rng.uniform(0.5, 2.0, nsrc)
    spi = rng.normal(scale=0.3, size=(nsrc, nord))
    ref_freq = rng.uniform(1.0e9, 1.4e9, nsrc)
    freq = np.linspace(0.856e9, 1.712e9, nchan)

    got = np.asarray(
        spectral_model(stokes, spi, ref_freq, freq, base=base)
    )

    ratio = freq[None, :] / ref_freq[:, None]  # (src, chan)
    if base == "std":
        want = stokes[:, None] * np.prod(
            ratio[:, None, :] ** spi[:, :, None], axis=1
        )
    else:
        logf = np.log(ratio) if base == "log" else np.log10(ratio)
        poly = sum(
            spi[:, o, None] * logf ** (o + 1) for o in range(nord)
        )
        want = stokes[:, None] * (
            np.exp(poly) if base == "log" else 10.0 ** poly
        )
    assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_shapelet_w_term_degenerate_beta(rng):
    """Degenerate (beta == 0) sources return exactly 1 with NO w-term
    phase, matching the reference's early continue
    (shapelets.py:134-136) — and the pair-native exports exist."""
    import jax.numpy as jnp
    from africanus_tpu.model.shape import (
        shapelet_ri, shapelet_with_w_term, shapelet_with_w_term_ri)

    nrow, nchan = 7, 3
    coords = rng.uniform(-500, 500, (nrow, 3))
    freq = np.linspace(1e9, 1.5e9, nchan)
    coeffs = rng.normal(size=(2, 2, 2))
    beta = np.array([[1e-3, 2e-3], [0.0, 2e-3]])  # source 1 degenerate
    lm = np.array([[0.01, -0.02], [0.015, 0.01]])  # off-centre

    out = np.asarray(shapelet_with_w_term(coords, freq, coeffs, beta,
                                          (1e-5, 1e-5), lm))
    assert_allclose(out[:, :, 1], 1.0 + 0j, rtol=0, atol=1e-12)

    # pair-native variants agree with the complex wrappers
    pr = shapelet_with_w_term_ri(coords, freq, coeffs, beta,
                                 (1e-5, 1e-5), lm)
    assert_allclose(np.asarray(pr.re) + 1j * np.asarray(pr.im), out,
                    rtol=1e-12)
    base = shapelet_ri(coords, freq, coeffs, beta, (1e-5, 1e-5))
    assert np.asarray(base.re).shape == (nrow, nchan, 2)
