"""Oracle tests for the split-pair matmul four-step FFT (ops/fft.py)
against numpy's pocketfft — the reference gets pocketfft inside ducc0
(reference gridding/wgridder/vis2im.py:4); the TPU path must match it to
dtype-appropriate tolerance at every size class it will meet."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from africanus_tpu.ops.fft import (
    _split_factor,
    split_fft,
    split_ifft,
)


def test_split_factor():
    assert _split_factor(4096) == (64, 64)
    assert _split_factor(2048) == (32, 64)
    assert _split_factor(1024) == (32, 32)
    assert _split_factor(60) == (6, 10)
    assert _split_factor(13) == (1, 13)
    assert _split_factor(1) == (1, 1)


@pytest.mark.parametrize("n", [8, 30, 128, 256, 480, 1024, 2048])
def test_fourstep_1d_matches_numpy_f64(rng, n):
    x = rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
    re, im = split_fft(x.real.copy(), x.imag.copy(), axes=(-1,))
    ref = np.fft.fft(x, axis=-1)
    assert_allclose(np.asarray(re), ref.real, rtol=0, atol=1e-9 * n)
    assert_allclose(np.asarray(im), ref.imag, rtol=0, atol=1e-9 * n)


@pytest.mark.parametrize("n", [97, 127])  # prime: direct matmul fallback
def test_prime_1d_matches_numpy(rng, n):
    x = rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
    re, im = split_fft(x.real.copy(), x.imag.copy(), axes=(-1,))
    ref = np.fft.fft(x, axis=-1)
    assert_allclose(np.asarray(re), ref.real, rtol=0, atol=1e-10 * n)
    assert_allclose(np.asarray(im), ref.imag, rtol=0, atol=1e-10 * n)


@pytest.mark.parametrize("shape,axes", [
    ((5, 64, 128), (1, 2)),
    ((2, 96, 96), (1, 2)),
    ((256, 256), (0, 1)),
])
def test_fourstep_2d_matches_numpy(rng, shape, axes):
    x = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    re, im = split_fft(x.real.copy(), x.imag.copy(), axes=axes)
    ref = np.fft.fftn(x, axes=axes)
    scale = np.abs(ref).max()
    assert_allclose(np.asarray(re), ref.real, rtol=0, atol=1e-12 * scale)
    assert_allclose(np.asarray(im), ref.imag, rtol=0, atol=1e-12 * scale)


def test_fourstep_2d_f32_tolerance(rng):
    """f32 four-step error stays at the epsilon=1e-4 wgridder budget for
    a 512² grid (the benched imaging size)."""
    shape = (512, 512)
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape))
    re32 = x.real.astype(np.float32)
    im32 = x.imag.astype(np.float32)
    re, im = split_fft(re32, im32, axes=(0, 1))
    ref = np.fft.fft2(x)
    l2 = np.sqrt(
        np.sum((np.asarray(re, np.float64) - ref.real) ** 2
               + (np.asarray(im, np.float64) - ref.imag) ** 2)
        / np.sum(np.abs(ref) ** 2)
    )
    assert l2 < 1e-5


def test_ifft_roundtrip(rng):
    x = rng.normal(size=(3, 60, 60)) + 1j * rng.normal(size=(3, 60, 60))
    re, im = split_fft(x.real.copy(), x.imag.copy(), axes=(1, 2))
    rre, rim = split_ifft(np.asarray(re), np.asarray(im), axes=(1, 2))
    assert_allclose(np.asarray(rre), x.real, rtol=0, atol=1e-11)
    assert_allclose(np.asarray(rim), x.imag, rtol=0, atol=1e-11)


def test_ifft_matches_numpy(rng):
    x = rng.normal(size=(128, 256)) + 1j * rng.normal(size=(128, 256))
    re, im = split_ifft(x.real.copy(), x.imag.copy(), axes=(0, 1))
    ref = np.fft.ifft2(x)
    assert_allclose(np.asarray(re), ref.real, rtol=0, atol=1e-13)
    assert_allclose(np.asarray(im), ref.imag, rtol=0, atol=1e-13)


def test_wgridder_dirty_through_split_fft(rng, monkeypatch):
    """The dirty pipeline through the SPLIT four-step FFT path (what the
    complex-less TPU actually runs) matches the native-complex-FFT path
    on CPU to f64 precision."""
    import africanus_tpu.ops.fft as fft_mod
    from africanus_tpu.gridding.wgridder.core import grid_adjoint
    from africanus_tpu.ops.cplx import Cplx

    C = 2.99792458e8
    nx = 32
    nrow, nchan = 300, 2
    cell = 3.0 * np.pi / 180 / nx
    freq = 1e9 + np.arange(nchan) * 5e8
    uvw = (rng.uniform(size=(nrow, 3)) - 0.5) / (cell * freq[-1] / C)
    vis = Cplx(rng.normal(size=(nrow, nchan)),
               rng.normal(size=(nrow, nchan)))

    native = np.asarray(
        grid_adjoint(uvw, freq, vis, None, nx, nx, cell, cell, 1e-5,
                     do_wstacking=True, use_tiles=False)
    )
    monkeypatch.setattr(fft_mod, "backend_has_complex", lambda: False)
    split = np.asarray(
        grid_adjoint(uvw, freq, vis, None, nx, nx, cell, cell, 1e-5,
                     do_wstacking=True, use_tiles=False)
    )
    assert_allclose(split, native, rtol=0,
                    atol=1e-10 * np.abs(native).max())


def test_wgridder_degrid_through_split_fft(rng, monkeypatch):
    """Forward-model (degrid) through the split four-step FFT path
    matches the native path."""
    import africanus_tpu.ops.fft as fft_mod
    from africanus_tpu.gridding.wgridder.core import degrid_ri

    C = 2.99792458e8
    nx = 32
    nrow, nchan = 200, 2
    cell = 3.0 * np.pi / 180 / nx
    freq = 1e9 + np.arange(nchan) * 5e8
    uvw = (rng.uniform(size=(nrow, 3)) - 0.5) / (cell * freq[-1] / C)
    image = rng.normal(size=(nx, nx))

    nat = degrid_ri(uvw, freq, image, None, cell, cell, 1e-5,
                    do_wstacking=True, use_tiles=False)
    native = np.asarray(nat.re) + 1j * np.asarray(nat.im)
    monkeypatch.setattr(fft_mod, "backend_has_complex", lambda: False)
    sp = degrid_ri(uvw, freq, image, None, cell, cell, 1e-5,
                   do_wstacking=True, use_tiles=False)
    split = np.asarray(sp.re) + 1j * np.asarray(sp.im)
    assert_allclose(split, native, rtol=0,
                    atol=1e-10 * np.abs(native).max())
