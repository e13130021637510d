"""africanus_tpu — TPU-native radio interferometry kernels.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ratt-ru/codex-africanus: RIME Jones-chain machinery, direct Fourier
transforms, convolutional gridding with w-stacking, baseline-dependent
and time/channel averaging, gain calibration, sky/spectral/coherency
models and Hogbom CLEAN deconvolution.

Layout
------
- ``rime``         — RIME terms: phase delay, predict_vis, beams, feeds,
                     parallactic angles, Zernike DDEs, fused RIME compiler
- ``dft``          — direct Fourier transforms (im_to_vis / vis_to_im)
- ``gridding``     — w-stacking gridder/degridder, Perley-polyhedron facets
- ``averaging``    — time+channel and baseline-dependent (BDA) averaging
- ``calibration``  — corrupt/correct/residual vis, phase-only Gauss-Newton
- ``model``        — coherency conversion, spectral models, shapes, SPI,
                     WSClean component lists
- ``coordinates``  — radec ↔ lm(n) transforms
- ``deconv``       — Hogbom CLEAN
- ``linalg``       — facet geometry, Kronecker GP algebra
- ``gps``          — Gaussian-process kernels
- ``ops``          — Pallas TPU kernels backing the hot paths
- ``parallel``     — mesh construction + shard_map orchestration (replaces
                     the reference's dask layer)
- ``utils``        — dtype inference, FITS beam parsing, misc helpers
"""

__version__ = "0.1.0"
