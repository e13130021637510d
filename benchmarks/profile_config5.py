#!/usr/bin/env python
"""Per-stage TPU profile of bench.py's config-5 selfcal loop.

Round-4 verdict directive 2: config 5 sits at roofline 0.488; find the
stage holding it under 0.5. Times each stage of the selfcal step
separately (GN solve, corrupt+residual, adjoint-DFT dirty image, Hogbom
CLEAN, re-predict) plus the full fused step, at the exact bench shapes
(SKA-mid 197 ant, 2 times, 16 chan, 20 srcs, 2 corr, 10 GN iters,
64^2 residual grid). Run alone on the box, tunnel healthy:

    cd /root/repo && timeout 280 python benchmarks/profile_config5.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from africanus_tpu.calibration.phase_only import gauss_newton_ri  # noqa: E402
from africanus_tpu.calibration.utils import corrupt_vis_ri  # noqa: E402
from africanus_tpu.deconv.hogbom import hogbom_clean  # noqa: E402
from africanus_tpu.dft import im_to_vis_ri, vis_to_im_ri  # noqa: E402
from africanus_tpu.ops.cplx import Cplx  # noqa: E402
from africanus_tpu.utils.profiling import measure  # noqa: E402

rng = np.random.default_rng(5)
f32 = np.float32
nant, ntime, nchan, nsrc, ncorr = 197, 2, 16, 20, 2
gn_iters = 10
npx = 64

a1u, a2u = np.triu_indices(nant, 1)
nrow = a1u.size * ntime
a1 = np.tile(a1u, ntime).astype(np.int32)
a2 = np.tile(a2u, ntime).astype(np.int32)
tbi = (np.arange(ntime) * a1u.size).astype(np.int32)
tbc = np.full(ntime, a1u.size, np.int32)

lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(f32)
uvw = rng.uniform(-4000, 4000, (nrow, 3)).astype(f32)
freq = np.linspace(0.856e9, 1.712e9, nchan).astype(f32)
image = rng.uniform(0.1, 1.0, (nsrc, nchan, ncorr)).astype(f32)
true_phase = rng.uniform(-0.5, 0.5,
                         (ntime, nant, nchan, 1, ncorr)).astype(f32)


@jax.jit
def make_data(image, uvw, lm, freq, phase):
    model = im_to_vis_ri(image, uvw, lm, freq)
    model2 = Cplx(model.re[:, :, None, :], model.im[:, :, None, :])
    gains = Cplx(jnp.cos(phase), jnp.sin(phase))
    return corrupt_vis_ri(tbi, tbc, a1, a2, gains, model2), model2


data, model2 = make_data(image, uvw, lm, freq, true_phase)
flag = np.zeros((nrow, nchan, ncorr), bool)
weight = np.ones((nrow, nchan, ncorr), f32)
jones0 = Cplx(np.ones((ntime, nant, nchan, 1, ncorr), f32),
              np.zeros((ntime, nant, nchan, 1, ncorr), f32))
nvis = nrow * nchan

grid_lm = np.stack(
    np.meshgrid(np.linspace(-0.01, 0.01, npx),
                np.linspace(-0.01, 0.01, npx), indexing="ij"),
    axis=-1,
).reshape(-1, 2).astype(f32)


def stage_gn(data):
    gains, jhj, jhr, k = gauss_newton_ri(
        tbi, tbc, a1, a2, jones0, data, flag, model2, weight,
        tol=0.0, maxiter=gn_iters)
    return gains.re.reshape(-1)


def stage_corrupt_resid(data):
    vmod = corrupt_vis_ri(tbi, tbc, a1, a2, jones0, model2)
    resid = Cplx(data.re - vmod.re, data.im - vmod.im)
    return (resid.re + resid.im).reshape(-1)


def stage_dirty(data):
    resid_i = Cplx(data.re.sum(-1, keepdims=True),
                   data.im.sum(-1, keepdims=True))
    im = vis_to_im_ri(resid_i, uvw, grid_lm, freq, flag[..., :1])
    return (im.sum(axis=(1, 2)) / nvis).reshape(-1)


DIRTY = np.asarray(jax.jit(stage_dirty)(data)).reshape(npx, npx)


def stage_hogbom(dirty):
    psf = jnp.zeros((2 * npx, 2 * npx), f32).at[npx - 1, npx - 1].set(1.0)
    cleaned, res = hogbom_clean(dirty, psf, gamma=0.1, threshold=0.2,
                                niter=50)
    return cleaned.reshape(-1)


def stage_repredict(uvw):
    out = im_to_vis_ri(image, uvw, lm, freq)
    return out.re.reshape(-1)


def full_step(data):
    gains, jhj, jhr, k = gauss_newton_ri(
        tbi, tbc, a1, a2, jones0, data, flag, model2, weight,
        tol=0.0, maxiter=gn_iters)
    vmod = corrupt_vis_ri(tbi, tbc, a1, a2, gains, model2)
    resid = Cplx(data.re - vmod.re, data.im - vmod.im)
    resid_i = Cplx(resid.re.sum(-1, keepdims=True),
                   resid.im.sum(-1, keepdims=True))
    im = vis_to_im_ri(resid_i, uvw, grid_lm, freq, flag[..., :1])
    dirty = im.sum(axis=(1, 2)).reshape(npx, npx) / nvis
    psf = jnp.zeros((2 * npx, 2 * npx), f32).at[npx - 1, npx - 1].set(1.0)
    cleaned, res = hogbom_clean(dirty, psf, gamma=0.1, threshold=0.2,
                                niter=50)
    re_model = im_to_vis_ri(image, uvw, lm, freq)
    return (gains.re[0, 0, 0, 0, 0] + cleaned[0, 0]
            + re_model.re[0, 0, 0])[None]


def t(label, fn, arg, reps=3):
    t0 = time.time()
    dt = measure(fn, arg, reps=reps)
    print(f"{label:24s} {dt * 1e3:9.2f} ms   (timed in {time.time()-t0:.0f}s)",
          flush=True)
    return dt


print(f"platform: {jax.devices()[0].platform}  nrow={nrow} nvis={nvis}",
      flush=True)
dt_gn = t("gn_solve(10it)", stage_gn, data)
dt_cr = t("corrupt+resid", stage_corrupt_resid, data)
dt_dirty = t("adjoint_dft_dirty", stage_dirty, data)
dt_hog = t("hogbom_50it", stage_hogbom, DIRTY)
dt_pred = t("re_predict", stage_repredict, uvw)
dt_full = t("FULL step", full_step, data)
print(f"stage sum {1e3*(dt_gn+dt_cr+dt_dirty+dt_hog+dt_pred):.2f} ms "
      f"vs full {1e3*dt_full:.2f} ms")
print(f"rate: {nvis * gn_iters / dt_full / 1e6:.1f} Mvis-iter/s")
