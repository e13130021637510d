#!/usr/bin/env python
"""Predict visibilities from a FITS model image with the DFT.

TPU-native analogue of the reference's
``africanus/dft/examples/predict_from_fits.py``: read a FITS image, pull
out its non-zero pixels as point components with lm coordinates from the
WCS cell size, and DFT-predict (im_to_vis) chunked over rows
(stream_rows stands in for the dask row chunking). MS IO is synthetic;
a demo FITS model is written if none is given.

Usage: python examples/predict_from_fits.py [model.fits]
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.dft import im_to_vis_ri
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.parallel import stream_rows
    from africanus_tpu.utils.fits import read_fits, write_fits

    rng = np.random.default_rng(0)
    nx = ny = 64
    cell_deg = 2.0 / 3600.0  # 2 arcsec cells

    if len(sys.argv) > 1:
        model_file = sys.argv[1]
    else:
        model_file = "/tmp/demo_model.fits"
        img = np.zeros((nx, ny), np.float32)
        for _ in range(5):
            img[rng.integers(8, nx - 8), rng.integers(8, ny - 8)] = \
                rng.uniform(0.5, 2.0)
        write_fits(model_file, img, [
            ("CTYPE1", "RA---SIN"), ("CDELT1", -cell_deg),
            ("CRPIX1", nx // 2 + 1.0), ("CRVAL1", 60.0),
            ("CTYPE2", "DEC--SIN"), ("CDELT2", cell_deg),
            ("CRPIX2", ny // 2 + 1.0), ("CRVAL2", -50.0),
        ])
        print(f"wrote demo model to {model_file}")

    header, image = read_fits(model_file)
    nx, ny = image.shape
    cdelt = abs(float(header.get("CDELT2", cell_deg)))
    cell_rad = np.deg2rad(cdelt)

    # non-zero pixels → point components with lm offsets from centre
    ix, iy = np.nonzero(image)
    flux = image[ix, iy].astype(np.float32)
    l = (ix - nx // 2) * cell_rad  # noqa: E741
    m = (iy - ny // 2) * cell_rad
    lm = np.stack([l, m], axis=1).astype(np.float32)
    print(f"model: {flux.size} components, total flux {flux.sum():.3f}")

    # synthetic observation
    nrow, nchan = 5000, 16
    freq = np.linspace(0.856e9, 1.712e9, nchan).astype(np.float32)
    uvw = rng.uniform(-2000, 2000, (nrow, 3)).astype(np.float32)
    img_cube = np.broadcast_to(
        flux[:, None, None], (flux.size, nchan, 1)
    ).astype(np.float32)

    def fn(tree, valid):
        out = im_to_vis_ri(img_cube, tree["uvw"], lm, freq)
        return out

    vis = stream_rows(fn, {"uvw": uvw}, chunk=2048, combine="concat")
    v = np.asarray(vis.re) + 1j * np.asarray(vis.im)
    print(f"device: {jax.devices()[0]}")
    print(f"predicted vis: {v.shape}")
    # zero baseline would see the total flux; check amplitude bound
    assert np.abs(v).max() <= flux.sum() * (1 + 1e-4)
    print(f"|vis| max {np.abs(v).max():.3f} <= total flux {flux.sum():.3f}")


if __name__ == "__main__":
    main()
