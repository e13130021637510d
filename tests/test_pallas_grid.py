"""Unit tests for the Pallas tile gridder's host planning + fold/unfold
machinery (ops/pallas_grid.py) against direct numpy oracles, and the
kernels in interpret mode. End-to-end parity lives in test_wgridder.py."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.ops.pallas_grid import (
    assemble_tiles,
    choose_tile,
    degrid_tiles_pallas,
    extract_tiles,
    grid_tiles_pallas,
    pack_shard_plans,
    plan_tiles,
)

W, BETA = 6, 2.3 * 6


def es_np(z, beta=BETA):
    inside = np.abs(z) < 1
    zc = np.where(inside, z, 0.0)
    return np.where(inside, np.exp(beta * (np.sqrt(1 - zc * zc) - 1)), 0.0)


def _problem(rng, n, nu, nv):
    upos = rng.uniform(0, nu, n)
    vpos = rng.uniform(0, nv, n)
    iu0 = np.floor(upos).astype(np.int64) - (W // 2 - 1)
    iv0 = np.floor(vpos).astype(np.int64) - (W // 2 - 1)
    return iu0, iv0, (upos - iu0), (vpos - iv0)


def _oracle(iu0, iv0, uf, vf, vre, nu, nv, scale=None):
    offs = np.arange(W)
    ku = es_np((uf[:, None] - offs) / (W / 2.0))
    kv = es_np((vf[:, None] - offs) / (W / 2.0))
    out = np.zeros((nu, nv))
    s = np.ones_like(vre) if scale is None else scale
    for i in range(iu0.shape[0]):
        for a in range(W):
            for b in range(W):
                out[(iu0[i] + a) % nu, (iv0[i] + b) % nv] += (
                    s[i] * vre[i] * ku[i, a] * kv[i, b]
                )
    return out


def test_choose_tile():
    assert choose_tile(1024) == 256
    assert choose_tile(36) == 36
    assert choose_tile(500) == 250
    assert choose_tile(7) == 7


def test_plan_tiles_validation():
    iu0 = np.array([5])
    with pytest.raises(ValueError, match="must divide"):
        plan_tiles(iu0, iu0, [0.5], [0.5], W, BETA, 64, 64, tile_r=60)
    with pytest.raises(ValueError, match="support"):
        plan_tiles(iu0, iu0, [0.5], [0.5], 16, BETA, 64, 64, tile_r=8,
                   tile_c=8)


def test_grid_tiles_wrap_oracle(rng):
    """Windows wrapping all four grid edges match a literal mod-indexed
    accumulation oracle (interpret mode)."""
    import jax.numpy as jnp

    nu = nv = 64
    n = 120
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    plan = plan_tiles(iu0, iv0, uf, vf, W, BETA, nu, nv, group=32)
    vre = rng.normal(size=n).astype(np.float32)

    t_re, t_im = grid_tiles_pallas(
        plan, jnp.asarray(vre), jnp.asarray(vre) * 0.0, interpret=True
    )
    g_re, _ = assemble_tiles(t_re, t_im, plan)
    ref = _oracle(iu0, iv0, uf, vf, vre, nu, nv)
    assert_allclose(np.asarray(g_re[0]), ref, rtol=2e-5, atol=1e-6)


def test_grid_tiles_planes_and_scale(rng):
    """Virtual samples with per-entry scale land on their plane."""
    import jax.numpy as jnp

    nu = nv = 32
    n = 40
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    plane = rng.integers(0, 3, n)
    scale = rng.uniform(0.2, 1.0, n).astype(np.float32)
    vre = rng.normal(size=n).astype(np.float32)

    plan = plan_tiles(iu0, iv0, uf, vf, W, BETA, nu, nv, group=16,
                      scale=scale, plane=plane, nplanes=3)
    t_re, t_im = grid_tiles_pallas(plan, jnp.asarray(vre),
                                   jnp.asarray(vre) * 0.0, interpret=True)
    g_re, _ = assemble_tiles(t_re, t_im, plan)
    assert g_re.shape == (3, nu, nv)
    for p in range(3):
        sel = plane == p
        ref = _oracle(iu0[sel], iv0[sel], uf[sel], vf[sel], vre[sel], nu,
                      nv, scale=scale[sel])
        assert_allclose(np.asarray(g_re[p]), ref, rtol=2e-5, atol=1e-6)


def test_extract_is_adjoint_of_assemble(rng):
    """<assemble(T), G> == <T, extract(G)> — fold/unfold are exact
    adjoints (they are transposes of one another)."""
    import jax.numpy as jnp

    nu = nv = 32
    n = 25
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    plan = plan_tiles(iu0, iv0, uf, vf, W, BETA, nu, nv, group=32)
    ntiles = plan["ntr"] * plan["ntc"]
    t = rng.normal(size=(ntiles, plan["tpad_r"], plan["tpad_c"]))
    # zero the dead padding rows/cols (never written by the kernel)
    t[:, plan["tile_r"] + 2 * W :, :] = 0
    t[:, :, plan["tile_c"] + 2 * W :] = 0
    g = rng.normal(size=(1, nu, nv))

    a_t, _ = assemble_tiles(jnp.asarray(t), jnp.asarray(t) * 0.0, plan)
    e_g, _ = extract_tiles(jnp.asarray(g), jnp.asarray(g) * 0.0, plan)
    lhs = float(np.sum(np.asarray(a_t) * g))
    rhs = float(np.sum(t * np.asarray(e_g)))
    assert_allclose(lhs, rhs, rtol=1e-10)


def test_pack_shard_plans_mismatch(rng):
    nu = nv = 64
    iu0, iv0, uf, vf = _problem(rng, 30, nu, nv)
    p1 = plan_tiles(iu0, iv0, uf, vf, W, BETA, nu, nv, group=16)
    p2 = plan_tiles(iu0, iv0, uf, vf, W, BETA, 128, 128, group=16)
    with pytest.raises(ValueError, match="disagree"):
        pack_shard_plans([p1, p2])

    # padded stacking: different ngroups pad to the max with inert groups
    p3 = plan_tiles(iu0[:5], iv0[:5], uf[:5], vf[:5], W, BETA, nu, nv,
                    group=16)
    static, arrays = pack_shard_plans([p1, p3])
    assert static["ngroups"] == max(p1["ngroups"], p3["ngroups"])
    for k, a in arrays.items():
        assert a.shape[0] == 2
        assert a.shape[1] == static["ngroups"]


@pytest.mark.parametrize("w", [10, 12])
def test_grid_tiles_wide_support_oracle(rng, w):
    """Supports > 9 widen the RMW block to 24 rows: the worst-case sub-8
    shift (7) plus W rows must fit, or the last tap rows silently drop
    (round-1 advisor finding — nifty's default eps hits W=10)."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import plan_tiles as pt

    beta = 2.3 * w
    nu = nv = 64
    n = 96
    upos = rng.uniform(0, nu, n)
    vpos = rng.uniform(0, nv, n)
    iu0 = np.floor(upos).astype(np.int64) - (w // 2 - 1)
    iv0 = np.floor(vpos).astype(np.int64) - (w // 2 - 1)
    uf, vf = upos - iu0, vpos - iv0
    plan = pt(iu0, iv0, uf, vf, w, beta, nu, nv, group=32)
    assert plan["blk"] == 24
    vre = rng.normal(size=n).astype(np.float32)

    t_re, t_im = grid_tiles_pallas(
        plan, jnp.asarray(vre), jnp.asarray(vre) * 0.0, interpret=True
    )
    g_re, _ = assemble_tiles(t_re, t_im, plan)

    offs = np.arange(w)
    ku = es_np((uf[:, None] - offs) / (w / 2.0), beta)
    kv = es_np((vf[:, None] - offs) / (w / 2.0), beta)
    ref = np.zeros((nu, nv))
    for i in range(n):
        for a in range(w):
            for b in range(w):
                ref[(iu0[i] + a) % nu, (iv0[i] + b) % nv] += (
                    vre[i] * ku[i, a] * kv[i, b]
                )
    # wider supports mean steeper beta (2.3·W): tiny-tap cells carry more
    # relative f32 rounding, so the bound is on the grid scale
    scale = np.abs(ref).max()
    assert_allclose(np.asarray(g_re[0]), ref, rtol=0, atol=3e-5 * scale)


def test_degrid_tiles_spot_oracle(rng):
    """Tile degrid values equal the direct windowed sum (interpret)."""
    import jax.numpy as jnp

    nu = nv = 32
    n = 20
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    plan = plan_tiles(iu0, iv0, uf, vf, W, BETA, nu, nv, group=16)
    g = rng.normal(size=(1, nu, nv)).astype(np.float32)

    tre, tim = extract_tiles(jnp.asarray(g), jnp.asarray(g) * 0.0, plan)
    o_re, _ = degrid_tiles_pallas(plan, tre, tim, n, interpret=True)

    offs = np.arange(W)
    ku = es_np((uf[:, None] - offs) / (W / 2.0))
    kv = es_np((vf[:, None] - offs) / (W / 2.0))
    for i in range(n):
        acc = 0.0
        for a in range(W):
            for b in range(W):
                acc += ku[i, a] * kv[i, b] * g[0, (iu0[i] + a) % nu,
                                               (iv0[i] + b) % nv]
        assert_allclose(np.asarray(o_re)[i], acc, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("merge", [1, 4])
def test_wstack_fused_matches_virtual_samples(rng, merge):
    """The multi-plane w-stack kernel (one entry per sample spreading to
    all touched planes) must reproduce the per-plane virtual-sample
    formulation exactly (interpret mode), with and without the
    register-merge RMW batching."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_wstack_tiles, grid_tiles_wstack_pallas, plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 12
    n = 150
    upos = rng.uniform(0, nu, n)
    vpos = rng.uniform(0, nv, n)
    iu0 = np.floor(upos).astype(np.int64) - (w // 2 - 1)
    iv0 = np.floor(vpos).astype(np.int64) - (w // 2 - 1)
    uf, vf = upos - iu0, vpos - iv0
    # windows stay inside the stack (the wgridder pads nplanes by
    # support+2 for exactly this; plan_tiles_wstack rejects out-of-stack)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    z = (wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0)
    kw = es_np(z, beta)
    vre = rng.normal(size=n).astype(np.float32)

    # old formulation: per-plane virtual samples
    plane_v = np.clip(iw0[:, None] + offs, 0, nplanes - 1).ravel()
    plan_old = plan_tiles(
        np.repeat(iu0, w), np.repeat(iv0, w),
        np.repeat(uf, w), np.repeat(vf, w), w, beta, nu, nv,
        sample_id=np.repeat(np.arange(n), w), scale=kw.ravel(),
        plane=plane_v, nplanes=nplanes, group=64,
    )
    t_re, t_im = grid_tiles_pallas(plan_old, jnp.asarray(vre),
                                   jnp.asarray(vre) * 0.0, interpret=True)
    ref, _ = assemble_tiles(t_re, t_im, plan_old)

    # fused formulation: one entry per sample
    plan_new = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                                 p0=iw0, wscales=kw.T, nplanes=nplanes,
                                 group=64, merge=merge)
    t2_re, t2_im = grid_tiles_wstack_pallas(
        plan_new, jnp.asarray(vre), jnp.asarray(vre) * 0.0, interpret=True
    )
    got, _ = assemble_wstack_tiles(t2_re, t2_im, plan_new)

    assert got.shape == ref.shape == (nplanes, nu, nv)
    assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                    atol=1e-6)


def test_wstack_fused_degrid_matches_oracle(rng):
    """The fused multi-plane degridder (one entry per sample gathering
    from all touched planes) equals the direct windowed sum over the
    3D (plane, u, v) grid (interpret mode)."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        degrid_tiles_wstack_pallas, extract_wstack_tiles,
        plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 12
    n = 100
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)

    plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                             p0=iw0, wscales=kw.T, nplanes=nplanes,
                             group=64)
    g = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    gi = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)

    tre, tim = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi), plan)
    o_re, o_im = degrid_tiles_wstack_pallas(plan, tre, tim, n,
                                            interpret=True)

    ku = es_np((uf[:, None] - offs) / (w / 2.0), beta)
    kv = es_np((vf[:, None] - offs) / (w / 2.0), beta)
    for i in range(0, n, 7):
        acc_re = acc_im = 0.0
        for t in range(w):
            for a in range(w):
                for b in range(w):
                    tap = kw[i, t] * ku[i, a] * kv[i, b]
                    acc_re += tap * g[iw0[i] + t, (iu0[i] + a) % nu,
                                      (iv0[i] + b) % nv]
                    acc_im += tap * gi[iw0[i] + t, (iu0[i] + a) % nu,
                                       (iv0[i] + b) % nv]
        assert_allclose(np.asarray(o_re)[i], acc_re, rtol=2e-4, atol=3e-5)
        assert_allclose(np.asarray(o_im)[i], acc_im, rtol=2e-4, atol=3e-5)


def test_wstack_plan_rejects_out_of_stack():
    """plan_tiles_wstack refuses windows leaving the w-stack (the kernels
    index planes directly; clipping would double-deposit on edges)."""
    from africanus_tpu.ops.pallas_grid import plan_tiles_wstack

    n, w = 10, 6
    iu0 = iv0 = np.zeros(n, np.int64)
    uf = vf = np.full(n, 2.0)
    wsc = np.ones((w, n), np.float32)
    with pytest.raises(ValueError, match="out of stack"):
        plan_tiles_wstack(iu0, iv0, uf, vf, w, BETA, 64, 64,
                          p0=np.full(n, -1), wscales=wsc, nplanes=12)
    with pytest.raises(ValueError, match="out of stack"):
        plan_tiles_wstack(iu0, iv0, uf, vf, w, BETA, 64, 64,
                          p0=np.full(n, 7), wscales=wsc, nplanes=12)


def test_wstack_mxu_grid_matches_scatter(rng):
    """The MXU matmul w-stack gridder (per-plane outer-product dots)
    must match the scatter formulation to f32 roundoff: zero taps make
    the dense sample contraction term-for-term identical."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_wstack_tiles, grid_tiles_wstack_mxu,
        grid_tiles_wstack_pallas, plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 12
    n = 150
    upos = rng.uniform(0, nu, n)
    vpos = rng.uniform(0, nv, n)
    iu0 = np.floor(upos).astype(np.int64) - (w // 2 - 1)
    iv0 = np.floor(vpos).astype(np.int64) - (w // 2 - 1)
    uf, vf = upos - iu0, vpos - iv0
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)
    vre = rng.normal(size=n).astype(np.float32)
    vim = rng.normal(size=n).astype(np.float32)

    plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                             p0=iw0, wscales=kw.T, nplanes=nplanes,
                             group=64)
    t_re, t_im = grid_tiles_wstack_pallas(plan, jnp.asarray(vre),
                                          jnp.asarray(vim), interpret=True)
    ref_re, ref_im = assemble_wstack_tiles(t_re, t_im, plan)
    m_re, m_im = grid_tiles_wstack_mxu(plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    got_re, got_im = assemble_wstack_tiles(m_re, m_im, plan)

    assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=2e-5,
                    atol=2e-5)
    assert_allclose(np.asarray(got_im), np.asarray(ref_im), rtol=2e-5,
                    atol=2e-5)


def test_wstack_mxu_degrid_matches_scatter(rng):
    """MXU matmul degrid (tile @ col-taps dots + row-tap reduce) equals
    the per-sample gather formulation, including the slot permutation
    back to visibility order."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        degrid_tiles_wstack_mxu, degrid_tiles_wstack_pallas,
        extract_wstack_tiles, plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 12
    n = 100
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)

    plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                             p0=iw0, wscales=kw.T, nplanes=nplanes,
                             group=64)
    g = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    gi = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    tre, tim = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi), plan)

    o_re, o_im = degrid_tiles_wstack_pallas(plan, tre, tim, n,
                                            interpret=True)
    m_re, m_im = degrid_tiles_wstack_mxu(plan, tre, tim, n,
                                         interpret=True)
    assert_allclose(np.asarray(m_re), np.asarray(o_re), rtol=2e-4,
                    atol=3e-5)
    assert_allclose(np.asarray(m_im), np.asarray(o_im), rtol=2e-4,
                    atol=3e-5)


def test_2d_mxu_grid_degrid_match_scatter(rng):
    """The 2D MXU matmul kernels (multi-correlation, virtual w-samples
    via per-entry scale) must match the scatter/gather tile kernels,
    including the gather+sum back onto owning visibilities."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_tiles, degrid_tiles_mxu, degrid_tiles_pallas,
        extract_tiles, grid_tiles_mxu, grid_tiles_pallas, plan_tiles,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 5
    n = 200
    upos = rng.uniform(0, nu, n)
    vpos = rng.uniform(0, nv, n)
    iu0 = np.floor(upos).astype(np.int64) - (w // 2 - 1)
    iv0 = np.floor(vpos).astype(np.int64) - (w // 2 - 1)
    uf, vf = upos - iu0, vpos - iv0
    scale = rng.uniform(0.2, 1.0, n)
    plane = rng.integers(0, nplanes, n)
    plan = plan_tiles(iu0, iv0, uf, vf, w, beta, nu, nv,
                      sample_id=np.arange(n), scale=scale, plane=plane,
                      nplanes=nplanes, group=64)

    ncorr = 4
    vre = jnp.asarray(rng.normal(size=(ncorr, n)).astype(np.float32))
    vim = jnp.asarray(rng.normal(size=(ncorr, n)).astype(np.float32))
    t_re, t_im = grid_tiles_pallas(plan, vre, vim, interpret=True)
    ref_re, ref_im = assemble_tiles(t_re, t_im, plan)
    m_re, m_im = grid_tiles_mxu(plan, vre, vim, interpret=True)
    got_re, got_im = assemble_tiles(m_re, m_im, plan)
    assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=2e-5,
                    atol=2e-5)
    assert_allclose(np.asarray(got_im), np.asarray(ref_im), rtol=2e-5,
                    atol=2e-5)

    g = jnp.asarray(rng.normal(size=(nplanes, nu, nv)).astype(np.float32))
    gi = jnp.asarray(rng.normal(size=(nplanes, nu, nv)).astype(np.float32))
    tre, tim = extract_tiles(g, gi, plan)
    o_re, o_im = degrid_tiles_pallas(plan, tre, tim, n, interpret=True)
    x_re, x_im = degrid_tiles_mxu(plan, tre, tim, n, interpret=True)
    assert_allclose(np.asarray(x_re), np.asarray(o_re), rtol=2e-4,
                    atol=3e-5)
    assert_allclose(np.asarray(x_im), np.asarray(o_im), rtol=2e-4,
                    atol=3e-5)


def test_wstack_merge_plan_invariants(rng):
    """Merged plans must make every aligned merge-block of entries share
    one RMW address (tile, p0, row block) with a REAL leading entry, and
    place every real sample exactly once."""
    from africanus_tpu.ops.pallas_grid import plan_tiles_wstack

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 12
    n = 777
    merge = 4
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)

    plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                             p0=iw0, wscales=kw.T, nplanes=nplanes,
                             group=64, merge=merge)
    assert plan["merge"] == merge
    group = plan["group"]
    sp = plan["sample_pack"].reshape(-1)
    irp = plan["ir_loc"].reshape(-1)
    p0p = plan["p0"].reshape(-1)
    wscp = plan["wsc"]  # (ngroups, w, group)

    # every real sample appears exactly once at its vis_slot
    slots = plan["vis_slot"]
    assert len(np.unique(slots)) == n
    assert (sp[slots] == np.arange(n)).all()

    # per aligned merge block: constant (p0, ir) and a real lead (inert
    # fill entries carry all-zero w-taps)
    real = np.zeros(sp.size, bool)
    real[slots] = True
    nblocks = sp.size // merge
    p0b = p0p.reshape(nblocks, merge)
    irb = irp.reshape(nblocks, merge)
    realb = real.reshape(nblocks, merge)
    taps = np.moveaxis(wscp, 1, 2).reshape(nblocks, merge, w)
    any_real = realb.any(axis=1)
    # the kernel reads the block's RMW address from its LEAD entry: every
    # real entry must share (p0, ir) with the lead (inert fill entries
    # keep defaults but have all-zero taps, so their address is unread)
    assert ((p0b == p0b[:, :1]) | ~realb).all()
    assert ((irb == irb[:, :1]) | ~realb).all()
    # blocks containing any real entry lead with a real entry
    assert realb[any_real, 0].all()
    # inert entries contribute nothing (zero taps)
    assert not taps[~realb].any()


def test_wstack_window_metadata_and_deep_stack(rng):
    """sort_planes plans must carry valid per-group w-windows (every
    entry's support window inside [pbase, pbase+nwin) ⊆ [0, nplanes)),
    keep the MXU route engaged on a DEEP stack (nwin ≈ support while
    nplanes ≫ 3·support), and the windowed MXU kernels must match the
    per-sample scatter/gather route there."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_wstack_tiles, degrid_tiles_wstack_mxu,
        degrid_tiles_wstack_pallas, extract_wstack_tiles,
        grid_tiles_wstack_mxu, grid_tiles_wstack_pallas,
        pack_shard_plans, plan_tiles_wstack, wstack_use_mxu,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 40  # deep: the old nplanes ≤ 3·support gate would refuse
    n = 300
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)
    vre = rng.normal(size=n).astype(np.float32)
    vim = rng.normal(size=n).astype(np.float32)

    plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                             p0=iw0, wscales=kw.T, nplanes=nplanes,
                             group=64)

    # window invariants, checked per packed entry
    nwin, pbase = plan["nwin"], plan["pbase"]
    assert wstack_use_mxu(plan) and nwin <= 3 * w
    gidx = plan["vis_slot"] // plan["group"]
    assert (pbase[gidx] <= iw0).all()
    assert (iw0 + w <= pbase[gidx] + nwin).all()
    assert (pbase >= 0).all() and pbase.max() + nwin <= nplanes

    t_re, t_im = grid_tiles_wstack_pallas(plan, jnp.asarray(vre),
                                          jnp.asarray(vim), interpret=True)
    ref_re, ref_im = assemble_wstack_tiles(t_re, t_im, plan)
    m_re, m_im = grid_tiles_wstack_mxu(plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    got_re, got_im = assemble_wstack_tiles(m_re, m_im, plan)
    assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=2e-5,
                    atol=2e-5)
    assert_allclose(np.asarray(got_im), np.asarray(ref_im), rtol=2e-5,
                    atol=2e-5)

    g = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    gi = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    tre, tim = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi), plan)
    o_re, o_im = degrid_tiles_wstack_pallas(plan, tre, tim, n,
                                            interpret=True)
    d_re, d_im = degrid_tiles_wstack_mxu(plan, tre, tim, n,
                                         interpret=True)
    assert_allclose(np.asarray(d_re), np.asarray(o_re), rtol=2e-4,
                    atol=3e-5)
    assert_allclose(np.asarray(d_im), np.asarray(o_im), rtol=2e-4,
                    atol=3e-5)

    # shard packing: window metadata survives, pbase stays in-stack
    # against the packed (max) nwin
    half = n // 2
    plan_a = plan_tiles_wstack(iu0[:half], iv0[:half], uf[:half],
                               vf[:half], w, beta, nu, nv, p0=iw0[:half],
                               wscales=kw[:half].T, nplanes=nplanes,
                               group=64)
    plan_b = plan_tiles_wstack(iu0[half:], iv0[half:], uf[half:],
                               vf[half:], w, beta, nu, nv, p0=iw0[half:],
                               wscales=kw[half:].T, nplanes=nplanes,
                               group=64)
    static, arrays = pack_shard_plans([plan_a, plan_b])
    assert static["nwin"] == max(plan_a["nwin"], plan_b["nwin"])
    assert arrays["pbase"].shape[0] == 2
    assert (arrays["pbase"] >= 0).all()
    assert arrays["pbase"].max() + static["nwin"] <= nplanes


def test_wstack_plane_blocked_matches_unblocked(rng):
    """Plane-blocked plans (depth-P w-blocks, boundary-straddling
    entries duplicated with complementary zero-masked taps) must
    reproduce the unblocked MXU route's grid and degrid results on a
    deep stack, through assembly/extraction and the sample scatter-add
    unpack (vis_slot is dropped when duplicates exist)."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_wstack_tiles, degrid_tiles_wstack_mxu,
        extract_wstack_tiles, grid_tiles_wstack_mxu, plan_tiles_wstack,
        wstack_use_mxu,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 40
    n = 400
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)
    vre = rng.normal(size=n).astype(np.float32)
    vim = rng.normal(size=n).astype(np.float32)

    ref_plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                                 p0=iw0, wscales=kw.T, nplanes=nplanes,
                                 group=64)
    blk_plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                                 p0=iw0, wscales=kw.T, nplanes=nplanes,
                                 group=64, plane_block=16)
    assert blk_plan["plane_block"] == 16 and blk_plan["nblk"] == 3
    assert wstack_use_mxu(blk_plan)
    assert "vis_slot" not in blk_plan  # duplicates exist at this density
    # every packed window stays inside its block
    assert blk_plan["nwin"] <= 16
    assert blk_plan["pbase"].min() >= 0
    assert blk_plan["pbase"].max() + blk_plan["nwin"] <= 16

    r_re, r_im = grid_tiles_wstack_mxu(ref_plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    ref_re, ref_im = assemble_wstack_tiles(r_re, r_im, ref_plan)
    b_re, b_im = grid_tiles_wstack_mxu(blk_plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    got_re, got_im = assemble_wstack_tiles(b_re, b_im, blk_plan)
    assert np.asarray(got_re).shape == np.asarray(ref_re).shape
    assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=2e-5,
                    atol=2e-5)
    assert_allclose(np.asarray(got_im), np.asarray(ref_im), rtol=2e-5,
                    atol=2e-5)

    g = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    gi = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    rt_re, rt_im = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi),
                                        ref_plan)
    bt_re, bt_im = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi),
                                        blk_plan)
    o_re, o_im = degrid_tiles_wstack_mxu(ref_plan, rt_re, rt_im, n,
                                         interpret=True)
    d_re, d_im = degrid_tiles_wstack_mxu(blk_plan, bt_re, bt_im, n,
                                         interpret=True)
    assert_allclose(np.asarray(d_re), np.asarray(o_re), rtol=2e-4,
                    atol=5e-5)
    assert_allclose(np.asarray(d_im), np.asarray(o_im), rtol=2e-4,
                    atol=5e-5)


def test_wstack_row_bucket_matches_unbucketed(rng):
    """Row-bucketed plans (entries binned by 8-aligned window start row,
    per-group ``rbase``, blk-row MXU slabs) must reproduce the plain
    MXU route's grid and degrid results, keep the pure-gather degrid
    inverse (no duplicates), and satisfy the slab invariants the kernel
    write relies on (alignment, in-bounds, output-block-consecutive
    groups)."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_wstack_tiles, degrid_tiles_wstack_mxu,
        extract_wstack_tiles, grid_tiles_wstack_mxu, plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 12
    n = 300
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)
    vre = rng.normal(size=n).astype(np.float32)
    vim = rng.normal(size=n).astype(np.float32)

    ref_plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                                 p0=iw0, wscales=kw.T, nplanes=nplanes,
                                 group=64)
    rb_plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                                p0=iw0, wscales=kw.T, nplanes=nplanes,
                                group=64, row_bucket=True)
    assert rb_plan["row_bucket"] is True
    assert "vis_slot" in rb_plan  # bucketing introduces no duplicates
    rbase = rb_plan["rbase"]
    blk = rb_plan["blk"]
    assert rbase.shape == (rb_plan["ngroups"],)
    assert np.all(rbase % 8 == 0)
    assert np.all(rbase + blk <= rb_plan["tpad_r"])
    # groups of one output block are consecutive (Pallas revisit rule)
    gt = rb_plan["group_tile"]
    changes = np.flatnonzero(np.diff(gt) != 0) + 1
    assert len(np.unique(gt[np.r_[0, changes]])) == len(np.r_[0, changes])
    # every real entry's taps live inside its group's [rbase, rbase+blk)
    ir = rb_plan["ir_loc"]  # (ngroups, S) 8-aligned window starts
    ufp = rb_plan["uf"]
    live = ufp > -2.0 * w  # padded slots carry the inert -2w marker
    assert np.all((ir >= rbase[:, None])[live])
    assert np.all((ir + 8 + w <= rbase[:, None] + blk + 8)[live])

    r_re, r_im = grid_tiles_wstack_mxu(ref_plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    ref_re, ref_im = assemble_wstack_tiles(r_re, r_im, ref_plan)
    b_re, b_im = grid_tiles_wstack_mxu(rb_plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    got_re, got_im = assemble_wstack_tiles(b_re, b_im, rb_plan)
    assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=2e-5,
                    atol=2e-5)
    assert_allclose(np.asarray(got_im), np.asarray(ref_im), rtol=2e-5,
                    atol=2e-5)
    # the VPU scatter kernel must read bucketed plans unchanged (the
    # overlay is ordering + metadata only) -- the route gate may still
    # pick it on deep stacks
    from africanus_tpu.ops.pallas_grid import grid_tiles_wstack_pallas
    s_re, s_im = grid_tiles_wstack_pallas(rb_plan, jnp.asarray(vre),
                                          jnp.asarray(vim),
                                          interpret=True)
    sc_re, sc_im = assemble_wstack_tiles(s_re, s_im, rb_plan)
    assert_allclose(np.asarray(sc_re), np.asarray(ref_re), rtol=2e-5,
                    atol=2e-5)
    assert_allclose(np.asarray(sc_im), np.asarray(ref_im), rtol=2e-5,
                    atol=2e-5)

    g = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    gi = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    rt_re, rt_im = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi),
                                        ref_plan)
    bt_re, bt_im = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi),
                                        rb_plan)
    o_re, o_im = degrid_tiles_wstack_mxu(ref_plan, rt_re, rt_im, n,
                                         interpret=True)
    d_re, d_im = degrid_tiles_wstack_mxu(rb_plan, bt_re, bt_im, n,
                                         interpret=True)
    assert_allclose(np.asarray(d_re), np.asarray(o_re), rtol=2e-4,
                    atol=5e-5)
    assert_allclose(np.asarray(d_im), np.asarray(o_im), rtol=2e-4,
                    atol=5e-5)


def test_wstack_row_bucket_with_plane_block(rng):
    """row_bucket composes with plane_block: buckets split the
    (uv-tile, w-block) keys by row octave on top of the boundary
    duplication, and the combined plan still matches the plain MXU
    route on a deep stack."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_wstack_tiles, degrid_tiles_wstack_mxu,
        extract_wstack_tiles, grid_tiles_wstack_mxu, plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 40
    n = 400
    iu0, iv0, uf, vf = _problem(rng, n, nu, nv)
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)
    vre = rng.normal(size=n).astype(np.float32)
    vim = rng.normal(size=n).astype(np.float32)

    ref_plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                                 p0=iw0, wscales=kw.T, nplanes=nplanes,
                                 group=64)
    rb_plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                                p0=iw0, wscales=kw.T, nplanes=nplanes,
                                group=64, plane_block=16,
                                row_bucket=True)
    assert rb_plan["row_bucket"] is True
    assert rb_plan["plane_block"] == 16
    assert "vis_slot" not in rb_plan  # plane-block duplicates exist

    r_re, r_im = grid_tiles_wstack_mxu(ref_plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    ref_re, ref_im = assemble_wstack_tiles(r_re, r_im, ref_plan)
    b_re, b_im = grid_tiles_wstack_mxu(rb_plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    got_re, got_im = assemble_wstack_tiles(b_re, b_im, rb_plan)
    assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=2e-5,
                    atol=2e-5)
    assert_allclose(np.asarray(got_im), np.asarray(ref_im), rtol=2e-5,
                    atol=2e-5)

    g = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    gi = rng.normal(size=(nplanes, nu, nv)).astype(np.float32)
    rt_re, rt_im = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi),
                                        ref_plan)
    bt_re, bt_im = extract_wstack_tiles(jnp.asarray(g), jnp.asarray(gi),
                                        rb_plan)
    o_re, o_im = degrid_tiles_wstack_mxu(ref_plan, rt_re, rt_im, n,
                                         interpret=True)
    d_re, d_im = degrid_tiles_wstack_mxu(rb_plan, bt_re, bt_im, n,
                                         interpret=True)
    assert_allclose(np.asarray(d_re), np.asarray(o_re), rtol=2e-4,
                    atol=5e-5)
    assert_allclose(np.asarray(d_im), np.asarray(o_im), rtol=2e-4,
                    atol=5e-5)


def test_wstack_mxu_bf16x3_dot_mode(rng, monkeypatch):
    """The hand-rolled bf16x3 dot mode (AFRICANUS_TPU_WGRID_DOT=bf16x3
    — the TOOLCHAIN.md item-1 workaround: 3 MXU passes instead of
    HIGHEST's 6) must match HIGHEST to ~1e-5 relative on both MXU
    w-stack directions; the gridder's ES accuracy budget is 1e-4."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        degrid_tiles_wstack_mxu, grid_tiles_wstack_mxu,
        plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 64
    nplanes = 12
    n = 150
    upos = rng.uniform(0, nu, n)
    vpos = rng.uniform(0, nv, n)
    iu0 = np.floor(upos).astype(np.int64) - (w // 2 - 1)
    iv0 = np.floor(vpos).astype(np.int64) - (w // 2 - 1)
    uf, vf = upos - iu0, vpos - iv0
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)
    vre = rng.normal(size=n).astype(np.float32)
    vim = rng.normal(size=n).astype(np.float32)

    plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                             p0=iw0, wscales=kw.T, nplanes=nplanes,
                             group=64, row_bucket=True)
    h_re, h_im = grid_tiles_wstack_mxu(plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    monkeypatch.setenv("AFRICANUS_TPU_WGRID_DOT", "bf16x3")
    b_re, b_im = grid_tiles_wstack_mxu(plan, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    scale = float(np.abs(np.asarray(h_re)).max())
    assert np.abs(np.asarray(b_re) - np.asarray(h_re)).max() < 3e-5 * scale
    assert np.abs(np.asarray(b_im) - np.asarray(h_im)).max() < 3e-5 * scale

    d_b = degrid_tiles_wstack_mxu(plan, np.asarray(h_re),
                                  np.asarray(h_im), n, interpret=True)
    monkeypatch.delenv("AFRICANUS_TPU_WGRID_DOT")
    d_h = degrid_tiles_wstack_mxu(plan, np.asarray(h_re),
                                  np.asarray(h_im), n, interpret=True)
    ds = float(np.abs(np.asarray(d_h[0])).max())
    assert np.abs(np.asarray(d_b[0]) - np.asarray(d_h[0])).max() < 3e-5 * ds
    assert np.abs(np.asarray(d_b[1]) - np.asarray(d_h[1])).max() < 3e-5 * ds


def test_wstack_mxu_packed_supergroups(rng):
    """pack_supergroups: subs sub-groups per MXU kernel step (each on
    its own sublane) must match the unpacked scatter route exactly in
    both directions, including the recomputed vis_slot inverse."""
    import jax.numpy as jnp
    from africanus_tpu.ops.pallas_grid import (
        assemble_wstack_tiles, degrid_tiles_wstack_mxu,
        degrid_tiles_wstack_pallas, extract_wstack_tiles,
        grid_tiles_wstack_mxu, grid_tiles_wstack_pallas,
        pack_supergroups, plan_tiles_wstack,
    )

    w, beta = 6, 2.3 * 6
    nu = nv = 128
    nplanes = 12
    n = 3000
    upos = rng.uniform(0, nu, n)
    vpos = rng.uniform(0, nv, n)
    iu0 = np.floor(upos).astype(np.int64) - (w // 2 - 1)
    iv0 = np.floor(vpos).astype(np.int64) - (w // 2 - 1)
    uf, vf = upos - iu0, vpos - iv0
    wpos = rng.uniform(w / 2, nplanes - w / 2 - 1, n)
    iw0 = np.floor(wpos).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    kw = es_np((wpos[:, None] - (iw0[:, None] + offs)) / (w / 2.0), beta)
    vre = rng.normal(size=n).astype(np.float32)
    vim = rng.normal(size=n).astype(np.float32)

    plan = plan_tiles_wstack(iu0, iv0, uf, vf, w, beta, nu, nv,
                             p0=iw0, wscales=kw.T, nplanes=nplanes,
                             tile_r=64, tile_c=64, group=64,
                             row_bucket=True)
    packed = pack_supergroups(plan, 4)
    assert packed["subs"] == 4
    assert packed["ngroups"] % 4 == 0
    # per-SUPER-group metadata, per-sub-group scalars
    nsg = packed["ngroups"] // 4
    assert packed["group_tile"].shape == (nsg,)
    assert packed["first"].shape == (nsg,)
    assert packed["rbase"].shape == (packed["ngroups"],)

    t_re, t_im = grid_tiles_wstack_pallas(plan, jnp.asarray(vre),
                                          jnp.asarray(vim),
                                          interpret=True)
    ref_re, ref_im = assemble_wstack_tiles(t_re, t_im, plan)
    m_re, m_im = grid_tiles_wstack_mxu(packed, jnp.asarray(vre),
                                       jnp.asarray(vim), interpret=True)
    got_re, got_im = assemble_wstack_tiles(m_re, m_im, packed)
    sc = float(np.abs(np.asarray(ref_re)).max())
    assert np.abs(np.asarray(got_re) - np.asarray(ref_re)).max() < 2e-5 * sc
    assert np.abs(np.asarray(got_im) - np.asarray(ref_im)).max() < 2e-5 * sc

    x_re, x_im = extract_wstack_tiles(np.asarray(ref_re),
                                      np.asarray(ref_im), plan)
    d_ref = degrid_tiles_wstack_pallas(plan, x_re, x_im, n,
                                       interpret=True)
    xp_re, xp_im = extract_wstack_tiles(np.asarray(ref_re),
                                        np.asarray(ref_im), packed)
    d_got = degrid_tiles_wstack_mxu(packed, xp_re, xp_im, n,
                                    interpret=True)
    ds = float(np.abs(np.asarray(d_ref[0])).max())
    assert np.abs(np.asarray(d_got[0]) - np.asarray(d_ref[0])).max() \
        < 2e-5 * ds
    assert np.abs(np.asarray(d_got[1]) - np.asarray(d_ref[1])).max() \
        < 2e-5 * ds
