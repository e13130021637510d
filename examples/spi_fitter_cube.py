#!/usr/bin/env python
"""Image-cube spectral-index fitter CLI.

TPU-native counterpart of the reference's simple_spi_fitter.py
(/root/reference/africanus/model/spi/examples/simple_spi_fitter.py,
581 lines): restore a FITS model cube with the clean beam, threshold
components against the residual rms (or a dynamic-range limit), fit
per-pixel power laws I(ν) = I₀·(ν/ν₀)^α with the jitted Gauss-Newton
component fitter (africanus_tpu.model.spi.fit_spi_components), and write
α / α-error / I₀ / I₀-error maps and the reconstructed cube as FITS.

Differences by design: the FFT convolution runs through the split-pair
four-step FFT (ops/fft.py — works on the complex-less TPU), the fitter
is one jit over all components (no dask chunking / ncpu knob), and FITS
IO uses the self-contained reader (no astropy in this environment). An
optional primary-beam cube (utils/beams schema) divides the components
before fitting, mirroring the reference's --beammodel.

Usage:
  python examples/spi_fitter_cube.py --fitsmodel model.fits \
      [--fitsresidual resid.fits] [--beampars EMAJ EMIN PA(deg)] \
      [--threshold 5] [--maxDR 100] [--outfile prefix] \
      [--output aeIkc] [--padding-frac 0.2] [--beammodel schema.fits]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
    # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from africanus_tpu.model.spi import fit_spi_components  # noqa: E402
from africanus_tpu.ops.fft import cfft2, cifft2  # noqa: E402
from africanus_tpu.utils.fits import read_fits, write_fits  # noqa: E402


def parse_cube_header(hdr):
    """(l_coord, m_coord, freqs, ref_freq, freq_axis) from a FITS image
    cube header with FREQ on axis 3 or 4 and degree sky units."""
    for ax in (1, 2):
        unit = str(hdr.get(f"CUNIT{ax}", "deg")).strip().lower()
        if unit != "deg":
            raise ValueError(f"CUNIT{ax} must be degrees, got {unit!r}")

    def axis_coords(ax):
        n = hdr[f"NAXIS{ax}"]
        refpix = hdr.get(f"CRPIX{ax}", 1.0)
        delta = hdr.get(f"CDELT{ax}", 1.0)
        return (np.arange(1, n + 1) - refpix) * delta

    l_coord = axis_coords(1)
    m_coord = axis_coords(2)

    freq_axis = None
    for ax in (3, 4):
        if str(hdr.get(f"CTYPE{ax}", "")).strip().upper().startswith("FREQ"):
            freq_axis = ax
            break
    if freq_axis is None:
        raise ValueError("FREQ must be on axis 3 or 4")
    ref_freq = hdr.get(f"CRVAL{freq_axis}")
    freqs = ref_freq + axis_coords(freq_axis)
    return l_coord, m_coord, freqs, ref_freq, freq_axis


def restoring_beam(l_coord, m_coord, emaj, emin, pa_deg):
    """Peak-normalised elliptical Gaussian (FWHM major/minor in degrees,
    position angle in degrees) sampled on the image grid."""
    fwhm2sig = 1.0 / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    sx = max(emaj, emin) * fwhm2sig
    sy = min(emaj, emin) * fwhm2sig
    th = np.deg2rad(90.0 + pa_deg)
    ll, mm = np.meshgrid(l_coord, m_coord, indexing="ij")
    u = ll * np.cos(th) + mm * np.sin(th)
    v = -ll * np.sin(th) + mm * np.cos(th)
    return np.exp(-0.5 * ((u / sx) ** 2 + (v / sy) ** 2))


def fft_convolve_cube(cube, kern, padding_frac):
    """Per-band 2D FFT convolution with a shared kernel (split-pair FFTs
    — runs on the complex-less TPU backend as matmul four-step)."""
    nband, nl, nm = cube.shape
    pad_l = int(np.ceil(padding_frac * nl / 2))
    pad_m = int(np.ceil(padding_frac * nm / 2))
    # 8-smooth padded sizes keep the four-step factors MXU-friendly
    nfl = int(2 ** np.ceil(np.log2(nl + 2 * pad_l)))
    nfm = int(2 ** np.ceil(np.log2(nm + 2 * pad_m)))

    def pad(img):
        return jnp.pad(jnp.asarray(img),
                       ((0, 0), (0, nfl - nl), (0, nfm - nm)))

    kf_re, kf_im = cfft2(pad(kern[None]), jnp.zeros((1, nfl, nfm)))
    cf_re, cf_im = cfft2(pad(cube), jnp.zeros((nband, nfl, nfm)))
    pre = cf_re * kf_re - cf_im * kf_im
    pim = cf_re * kf_im + cf_im * kf_re
    out_re, _ = cifft2(pre, pim)
    # the kernel grid is centred on the image centre: roll that offset
    # out and crop the padding (the pad absorbs the beam tails, so the
    # residual circular wrap is below the beam's floor)
    out = np.asarray(out_re)
    cl, cm = nl // 2, nm // 2
    return np.roll(out, (-cl, -cm), axis=(1, 2))[:, :nl, :nm]


def evaluate_primary_beam(schema, maskindices, l_coord, m_coord, freqs):
    """Optional primary-beam amplitude (comps, chan) from a beam-cube
    schema, bilinearly interpolated at component positions."""
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri
    from africanus_tpu.utils.beams import load_beam_cube

    # CASA linear correlation ids XX/XY/YX/YY — a real beam schema ships
    # one re/im FITS pair per correlation, not all 16 stokes ids
    beam, extents, freq_map = load_beam_cube(schema, (9, 10, 11, 12))
    lm = np.deg2rad(
        np.stack(
            [l_coord[maskindices[:, 0]], m_coord[maskindices[:, 1]]],
            axis=1,
        )
    )
    ncomps = lm.shape[0]
    out = beam_cube_dde_ri(
        beam.astype(np.complex64),
        extents,
        freq_map,
        lm,
        np.zeros((1, 1)),                      # parallactic angles
        np.zeros((1, 1, freqs.size, 2)),       # pointing errors
        np.ones((1, freqs.size, 2)),           # antenna scaling
        freqs,
    )
    amp = np.sqrt(np.asarray(out.re) ** 2 + np.asarray(out.im) ** 2)
    # (src, time=1, ant=1, chan, corr...) -> mean over corrs
    amp = amp.reshape(ncomps, freqs.size, -1).mean(axis=-1)
    return amp


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--fitsmodel", required=True,
                   help="FITS model image cube (Stokes I)")
    p.add_argument("--fitsresidual",
                   help="FITS residual cube: sets the component threshold "
                        "from its rms and per-band fit weights")
    p.add_argument("--outfile", help="output prefix (default: model path "
                                     "with .fits stripped + '-')")
    p.add_argument("--beampars", nargs=3, type=float, metavar=("EMAJ", "EMIN", "PA"),
                   help="restoring beam FWHM maj/min [deg] and position "
                        "angle [deg]; default: BMAJ/BMIN/BPA header cards")
    p.add_argument("--threshold", type=float, default=5.0,
                   help="component cutoff in residual-rms units")
    p.add_argument("--maxDR", type=float, default=100.0,
                   help="dynamic-range cutoff when no residual is given")
    p.add_argument("--beammodel",
                   help="primary-beam cube schema (utils/beams) to divide "
                        "out before fitting")
    p.add_argument("--output", default="aeIkc",
                   help="products to write: a=alpha, e=alpha error, "
                        "I=I0, k=I0 error, c=reconstructed cube")
    p.add_argument("--padding-frac", type=float, default=0.2,
                   help="zero-padding fraction for the FFT convolution")
    args = p.parse_args(argv)

    mhdr, mdata = read_fits(args.fitsmodel)
    l_coord, m_coord, freqs, ref_freq, freq_axis = parse_cube_header(mhdr)
    nband = freqs.size
    # read_fits returns C order with NAXIS1 (l) as the LAST axis, i.e.
    # (nband, m, l): reorder to the (band, l, m) layout the restoring
    # beam / mask / fitter use
    model = np.asarray(mdata, np.float64).reshape(
        nband, m_coord.size, l_coord.size
    ).transpose(0, 2, 1)
    print(f"cube {model.shape}, ref_freq {ref_freq:.3e} Hz")

    if args.beampars is None:
        beampars = (mhdr["BMAJ"], mhdr["BMIN"], mhdr.get("BPA", 0.0))
        print("restoring beam from header cards")
    else:
        beampars = tuple(args.beampars)
    print("emaj %.3e deg, emin %.3e deg, pa %.1f deg" % beampars)

    kern = restoring_beam(l_coord, m_coord, *beampars)
    model = fft_convolve_cube(model, kern, args.padding_frac)

    if args.fitsresidual:
        _, rdata = read_fits(args.fitsresidual)
        resid = np.asarray(rdata, np.float64).reshape(
            nband, m_coord.size, l_coord.size
        ).transpose(0, 2, 1)
        rms = float(resid.std())
        rms_cube = resid.reshape(nband, -1).std(axis=1)
        threshold = args.threshold * rms
        weights = np.where(rms_cube > 0, 1.0 / rms_cube**2, 0.0)
        weights /= weights.max()
        print(f"threshold {threshold:.4e} Jy ({args.threshold} x rms)")
    else:
        threshold = model.max() / args.maxDR
        weights = np.ones(nband)
        print(f"threshold {threshold:.4e} Jy (maxDR {args.maxDR})")

    minimage = model.min(axis=0)
    maskindices = np.argwhere(minimage > threshold)
    if maskindices.size == 0:
        raise SystemExit("no components above threshold — lower it "
                         f"(convolved max {model.max():.3e} Jy)")
    fitcube = model[:, maskindices[:, 0], maskindices[:, 1]].T
    print(f"fitting {fitcube.shape[0]} components over {nband} bands")

    beam_amp = None
    if args.beammodel:
        beam_amp = evaluate_primary_beam(
            args.beammodel, maskindices, l_coord, m_coord, freqs
        )

    out = np.asarray(
        jax.jit(fit_spi_components)(
            jnp.asarray(fitcube), jnp.asarray(weights),
            jnp.asarray(freqs), float(ref_freq),
            beam=None if beam_amp is None else jnp.asarray(beam_amp),
        )
    )
    alpha, alpha_var, i0, i0_var = out

    npl, npm = l_coord.size, m_coord.size
    maps = {}
    for letter, vals in (("a", alpha), ("e", np.sqrt(alpha_var)),
                         ("I", i0), ("k", np.sqrt(i0_var))):
        img = np.zeros((npl, npm))
        img[maskindices[:, 0], maskindices[:, 1]] = vals
        maps[letter] = img

    if args.outfile:
        prefix = args.outfile
    else:
        prefix = args.fitsmodel[:-5] if args.fitsmodel.endswith(".fits") \
            else args.fitsmodel
        prefix += "-"

    cards = [(k, v) for k, v in mhdr.items()
             if isinstance(v, (int, float, str, bool))
             and not (k in ("SIMPLE", "BITPIX", "NAXIS", "END")
                      or (k.startswith("NAXIS") and k[5:].isdigit()))]
    names = dict(a="alpha", e="alpha_err", I="I0", k="I0_err")
    for letter, name in names.items():
        if letter in args.output:
            # write_fits is NAXIS1-fastest: l must be the LAST axis
            write_fits(f"{prefix}{name}.fits", maps[letter].T, cards)
            print(f"wrote {prefix}{name}.fits")
    if "c" in args.output:
        rec = (maps["I"][None]
               * (freqs[:, None, None] / ref_freq)
               ** np.where(maps["I"][None] != 0, maps["a"][None], 0.0))
        rec = rec.transpose(0, 2, 1)  # (band, m, l): l NAXIS1-fastest
        shape = ((1, nband, npm, npl) if freq_axis == 3
                 else (nband, 1, npm, npl))
        write_fits(f"{prefix}Irec_cube.fits", rec.reshape(shape), cards)
        print(f"wrote {prefix}Irec_cube.fits")


if __name__ == "__main__":
    main()
