#!/usr/bin/env python
"""Row-bucket / group-size sweep for the MXU w-stack gridder.

Round-4 verdict directive 3: push config-4 dirty past 50 Mvis/s. Times
the grid-adjoint step (and optionally degrid) at the bench config-4
shape (100k rows x 8 chan, 512^2, w-stacking, eps 1e-4) across
{row_bucket} x {group} x {tile_r} combos, each in a fresh subprocess so
the env-var knobs take effect and one wedged Mosaic compile cannot kill
the sweep. Run alone on the box, tunnel healthy:

    cd /root/repo && python benchmarks/sweep_wgrid.py [--quick]
"""

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from africanus_tpu.gridding.wgridder import grid_adjoint
from africanus_tpu.gridding.wgridder.core import make_plan, degrid_ri
from africanus_tpu.ops.cplx import Cplx
from africanus_tpu.utils.profiling import measure

C = 2.99792458e8
rng = np.random.default_rng(4)
f32 = np.float32
nx = ny = 512
nrow, nchan = 100_000, 8
fov = 1.0 * np.pi / 180
cell = fov / nx
freq = np.linspace(0.856e9, 1.712e9, nchan)
umax = 0.9 / (2 * cell * freq[-1] / C)
uvw = rng.uniform(-1, 1, (nrow, 3)) * np.array([umax, umax, umax / 20])
vis = rng.normal(size=(nrow, nchan)) + 1j * rng.normal(size=(nrow, nchan))
nvis = nrow * nchan
v32 = Cplx(jnp.asarray(vis.real.astype(f32)), jnp.asarray(vis.imag.astype(f32)))
uvw32 = uvw.astype(f32)
freq32 = freq.astype(f32)

t0 = time.perf_counter()
plan = make_plan(uvw32, freq32, nx, ny, cell, cell, 1e-4, True,
                 use_tiles=True)
plan_dt = time.perf_counter() - t0
tp = plan.get("tile_plan", {})
info = dict(plan_s=round(plan_dt, 2),
            ngroups=tp.get("ngroups"), group=tp.get("group"),
            tile_r=tp.get("tile_r"), tile_c=tp.get("tile_c"),
            nwin=tp.get("nwin"), blk=tp.get("blk"),
            row_bucket=bool(tp.get("row_bucket")),
            nplanes=tp.get("nplanes"))

t0 = time.perf_counter()
dt = measure(lambda v: grid_adjoint(uvw32, freq32, v, None, nx, ny, cell,
                                    cell, 1e-4, True, plan=plan),
             v32, reps=3)
info["compile_plus_time_s"] = round(time.perf_counter() - t0, 1)
info["dirty_mvis_s"] = round(nvis / dt / 1e6, 2)

if os.environ.get("SWEEP_STAGES") == "1":
    # stage split of the dirty step: vis gather, tile kernel, assemble,
    # FFT+w-correction remainder
    from africanus_tpu.ops import pallas_grid as pg

    tp2 = plan["tile_plan"]
    sp = jnp.asarray(tp2["sample_pack"])
    vre_flat = v32.re.reshape(-1)
    vim_flat = v32.im.reshape(-1)
    dtg = measure(lambda vr: vr[sp].sum().reshape(1), vre_flat, reps=10)
    info["gather_ms"] = round(2 * dtg * 1e3, 2)  # re+im

    gridfn = (pg.grid_tiles_wstack_mxu if pg.wstack_use_mxu(tp2)
              else pg.grid_tiles_wstack_pallas)
    dtk = measure(
        lambda vr: gridfn(tp2, vr, vim_flat)[0].reshape(-1)[:1],
        vre_flat, reps=3,
    )
    info["kernel_ms"] = round(dtk * 1e3, 2)  # includes both gathers

    t_re, t_im = gridfn(tp2, vre_flat, vim_flat)
    dta = measure(
        lambda tr: pg.assemble_wstack_tiles(tr, t_im, tp2)[0]
        .reshape(-1)[:1], t_re, reps=3,
    )
    info["assemble_ms"] = round(dta * 1e3, 2)

if os.environ.get("SWEEP_DEGRID") == "1":
    image32 = np.random.default_rng(5).normal(size=(nx, ny)).astype(f32)
    ddt = measure(lambda im: degrid_ri(uvw32, freq32, im, None, cell, cell,
                                       1e-4, True, plan=plan).re,
                  jnp.asarray(image32), reps=3)
    info["degrid_mvis_s"] = round(nvis / ddt / 1e6, 2)

# checksum for cross-combo parity
img = np.asarray(grid_adjoint(uvw32, freq32, v32, None, nx, ny, cell,
                              cell, 1e-4, True, plan=plan))
info["img_sum"] = float(np.abs(img).sum())
print("RESULT " + json.dumps(info), flush=True)
"""


def run(combo, timeout=340):
    env = dict(os.environ)
    env.update({k: str(v) for k, v in combo.items()})
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=timeout)
        out = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        res = json.loads(out[-1][7:]) if out else {"error": p.stderr[-400:]}
    except subprocess.TimeoutExpired:
        res = {"error": f"timeout {timeout}s"}
    res["combo"] = combo
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res), flush=True)
    return res


def main():
    quick = "--quick" in sys.argv
    combos = [
        # current default (row_bucket on, tr 32, group 512)
        {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1},
        # row-bucketing makes the dot cost independent of tile_r, so
        # LARGER tiles now cost nothing in MACs and give fewer, fuller
        # buckets (fill at tr32/g512 is only 0.51 — half the dot work
        # is group padding)
        {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1,
         "AFRICANUS_TPU_WGRID_TR": "128"},
        {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1,
         "AFRICANUS_TPU_WGRID_TR": "256"},
        # uv density is non-uniform, so sparse buckets dominate padding;
        # smaller groups trade per-group fixed cost for fill
        {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1,
         "AFRICANUS_TPU_WGRID_TR": "128",
         "AFRICANUS_TPU_WGRID_GROUP": 256},
    ]
    if not quick:
        combos += [
            {"AFRICANUS_TPU_WGRID_ROWBUCKET": 0},
            {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1,
             "AFRICANUS_TPU_WGRID_TR": "128",
             "AFRICANUS_TPU_WGRID_GROUP": 1024},
            {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1,
             "AFRICANUS_TPU_WGRID_GROUP": 1024},
            {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1,
             "AFRICANUS_TPU_WGRID_GROUP": 256},
            {"AFRICANUS_TPU_WGRID_ROWBUCKET": 1,
             "AFRICANUS_TPU_WGRID_TR": "128", "SWEEP_DEGRID": 1},
        ]
    for c in combos:
        run(c)


if __name__ == "__main__":
    main()
