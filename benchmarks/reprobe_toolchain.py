#!/usr/bin/env python
"""Round-N re-probe of the TOOLCHAIN.md blockers (verdict directive 8).

Each probe runs in a subprocess with a hard timeout (wedged remote
Mosaic compiles park at 0% CPU forever). Run alone, tunnel healthy:

    cd /root/repo && python benchmarks/reprobe_toolchain.py

Probes:
1. ``Precision.HIGH`` on an in-kernel Pallas dot (expect
   NotImplementedError from the Mosaic lowering while blocked).
2. 512-lane fused-DFT tiles (expect compile-timeout while blocked).
"""

import json
import os
import subprocess
import sys
import time

HIGH_PROBE = r"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

def kern(a_ref, b_ref, o_ref):
    o_ref[...] = lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGH,
        preferred_element_type=jnp.float32)

a = np.random.default_rng(0).normal(size=(128, 128)).astype(np.float32)
out = pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((128, 128), np.float32))(a, a)
got = float(np.asarray(out).sum())
want = float((a @ a).sum())
print("HIGH-OK rel_err", abs(got - want) / abs(want))
"""

DFT512_PROBE = r"""
import os, sys, time
os.environ["AFRICANUS_TPU_DFT_MAX_LANE_TILE"] = "512"
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from africanus_tpu.dft import im_to_vis_ri
rng = np.random.default_rng(0)
f32 = np.float32
nsrc, nrow, nchan = 100, 2016, 64  # KAT-7-ish config-1 shape
image = rng.uniform(0.1, 1, (nsrc, nchan, 1)).astype(f32)
uvw = rng.uniform(-1000, 1000, (nrow, 3)).astype(f32)
lm = (rng.uniform(-1, 1, (nsrc, 2)) * 0.01).astype(f32)
freq = np.linspace(0.856e9, 1.712e9, nchan).astype(f32)
t0 = time.time()
out = jax.jit(lambda im: im_to_vis_ri(im, uvw, lm, freq).re)(image)
s = float(np.asarray(out).sum())
print("DFT512-OK compile+run", round(time.time() - t0, 1), "s, sum", s)
"""


def probe(name, code, timeout):
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout)
        status = "ok" if p.returncode == 0 else "error"
        detail = (p.stdout.strip() or p.stderr.strip().splitlines()[-1]
                  if (p.stdout or p.stderr) else "")
        if p.returncode != 0:
            tail = p.stderr.strip().splitlines()
            detail = tail[-1] if tail else "no stderr"
    except subprocess.TimeoutExpired:
        status, detail = "timeout", f"{timeout}s"
    print(json.dumps(dict(probe=name, status=status,
                          wall_s=round(time.time() - t0, 1),
                          detail=detail[-300:])), flush=True)


if __name__ == "__main__":
    probe("pallas_dot_precision_HIGH", HIGH_PROBE, 150)
    probe("dft_512_lane_tiles", DFT512_PROBE, 280)
