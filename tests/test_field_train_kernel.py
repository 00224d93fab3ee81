"""Fused training kernel (custom VJP): interpret-mode equivalence
against a pure-JAX shadow of the identical math on CPU.

The shadow mirrors the kernel's ops including bf16 casts and the
detached roughness->attenuation edge, so outputs should agree to bf16
noise and gradients to fp32 accumulation noise.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.kernels import field_pallas as fp
from rsn.kernels import field_train as ft
from rsn.models import field as field_lib

R, S = 8, 8
N = R * S
TILE = 32  # 4 rays per tile, 2 grid steps


def shadow(params, mc, g, s=S):
    """Pure-JAX mirror of _kernel_v3 / _bwd_kernel forward math."""
    packed = fp.pack_params_v3(params)
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh,
     w_emb, b_mid, w_out, b_out) = packed
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    A, bA, V, M = fp.ipe_matrices()
    f32, bf16 = jnp.float32, jnp.bfloat16

    pre = mc @ A + bA
    var = mc @ V
    x = (M * (jnp.exp(-0.5 * var) * jnp.sin(pre))
         + (1.0 - M) * pre).astype(bf16)
    h = x
    for i in range(8):
        if i == fp.SKIP_AT:
            h = jnp.concatenate([x, h], axis=-1)
        acc = jax.lax.dot_general(h, ws[i], (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        h = jnp.maximum(acc + bs[i], 0.0).astype(bf16)
    heads = jax.lax.dot_general(h, wh, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32) + bh
    bneck = heads[:, 0:256].astype(bf16)
    diff = jax.nn.sigmoid(heads[:, 257:260])
    tint = jax.nn.sigmoid(heads[:, 260:263])
    rough_raw = heads[:, 263:264]
    normals_raw = heads[:, 264:267]
    rough_sp = jax.lax.stop_gradient(jax.nn.softplus(rough_raw))

    g_rep = jnp.repeat(g, s, axis=0)  # (N, 512)
    mid_pre = jax.lax.dot_general(bneck, w_emb, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32) + b_mid
    for bi, k in enumerate(ft._BAND_KS):
        mid_pre = mid_pre + jnp.exp(-rough_sp * k) * \
            g_rep[:, bi * 128:(bi + 1) * 128]
    hmid = jnp.maximum(mid_pre, 0.0).astype(bf16)
    z = jax.lax.dot_general(hmid, w_out, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32) + b_out
    mid = jax.nn.sigmoid(z[:, 0:3])
    mid_out = diff + tint * mid
    out = jnp.concatenate(
        [mid_out, diff, tint, normals_raw, heads[:, 256:257], rough_raw,
         jnp.zeros((mc.shape[0], 3), f32), mid,
         jnp.zeros((mc.shape[0], fp.V3_OUT - 20), f32)], axis=1)
    return out.astype(bf16)


@pytest.fixture(scope="module")
def setup():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (N, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1),
                                    (N, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], axis=-1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    g = fp.mid_g_bands(params, dirs)
    return params, mc, g


def test_forward_matches_shadow(setup):
    params, mc, g = setup
    out_i = fp.field_forward_v3(fp.pack_params_v3f(params), mc, g, S,
                                tile=TILE, interpret=True)
    out_s = shadow(params, mc, g)
    np.testing.assert_allclose(np.asarray(out_i, np.float32),
                               np.asarray(out_s, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_forward_narrow_out_cols_matches_full(setup):
    """out_cols=V3_EVAL_COLS (the render path's narrow store) must be a
    column-prefix of the full V3_OUT output, bit-identical."""
    params, mc, g = setup
    packed = fp.pack_params_v3f(params)
    out_full = fp.field_forward_v3(packed, mc, g, S, tile=TILE,
                                   interpret=True)
    out_narrow = fp.field_forward_v3(packed, mc, g, S, tile=TILE,
                                     interpret=True,
                                     out_cols=fp.V3_EVAL_COLS)
    assert out_narrow.shape == (N, fp.V3_EVAL_COLS)
    np.testing.assert_array_equal(
        np.asarray(out_narrow, np.float32),
        np.asarray(out_full[:, :fp.V3_EVAL_COLS], np.float32))


def _fout(params, mc, g, s=S):
    """Forward out (train width) for direct backward-kernel calls."""
    return fp.field_forward_v3(fp.pack_params_v3f(params), mc, g, s,
                               tile=TILE, interpret=True)


def test_backward_matches_shadow_grads(setup):
    params, mc, g = setup
    key = jax.random.PRNGKey(3)
    w_rand = jax.random.normal(key, (N, fp.V3_OUT))
    # cols 14:20 (dpdm + stored mid) are auxiliary sg outputs: the
    # backward ignores their cotangents by contract
    w_rand = w_rand.at[:, 14:20].set(0.0)

    def loss_shadow(p, m, gg):
        return jnp.sum(shadow(p, m, gg).astype(jnp.float32) * w_rand)

    gs_p, gs_mc, gs_g = jax.grad(loss_shadow, argnums=(0, 1, 2))(
        params, mc, g)

    d_out = w_rand.astype(jnp.bfloat16)
    packed = fp.pack_params_v3f(params)
    dmc, dg, dpacked = ft.field_backward_v3(
        packed, mc, g, d_out, _fout(params, mc, g), S, tile=TILE,
        interpret=True)
    gk_p = ft._unpack_grads(params, dpacked)

    # compare params grads (skip mid_mlp encoder rows: those flow via dg)
    np.testing.assert_allclose(np.asarray(gk_p["trunk"][0]["w"]),
                               np.asarray(gs_p["trunk"][0]["w"]),
                               atol=0.1, rtol=0.1)
    np.testing.assert_allclose(np.asarray(gk_p["trunk"][4]["w"]),
                               np.asarray(gs_p["trunk"][4]["w"]),
                               atol=0.1, rtol=0.1)
    for name in ("density", "diff", "tint", "roughness", "normals",
                 "bottleneck", "mid"):
        np.testing.assert_allclose(
            np.asarray(gk_p[name]["w"]), np.asarray(gs_p[name]["w"]),
            atol=0.05, rtol=0.1, err_msg=name)
    np.testing.assert_allclose(np.asarray(gk_p["mid_mlp"]["w"][34:]),
                               np.asarray(gs_p["mid_mlp"]["w"][34:]),
                               atol=0.05, rtol=0.1)
    np.testing.assert_allclose(np.asarray(dmc)[:, :6],
                               np.asarray(gs_mc)[:, :6],
                               atol=0.5, rtol=0.1)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(gs_g),
                               atol=0.05, rtol=0.1)


def test_fused_vs_unfused_packing_asymmetry_bounded():
    """Since r5 BOTH forward and backward use the folded packing
    (pack_params_v3f), so the vjp pair itself is symmetric; the
    remaining asymmetry is folded-vs-unfused against the pure-JAX
    shadow (which deliberately keeps the reference's two-matmul
    bottleneck form).  This pins that gap at bf16 resolution so a
    packing change that widens it fails loudly (ADVICE r1).
    """
    params = field_lib.init_field_params(jax.random.PRNGKey(7))
    f32, bf16 = jnp.float32, jnp.bfloat16
    h = jax.random.normal(jax.random.PRNGKey(8), (512, 256))
    h = jnp.maximum(h, 0.0).astype(bf16)  # trunk output: post-ReLU bf16

    # fused-forward path (pack_params_v3f): single-rounded w_comb
    wb = params["bottleneck"]["w"].astype(f32)
    bb = params["bottleneck"]["b"].astype(f32)
    w_emb = params["mid_mlp"]["w"][34:].astype(f32)
    b_mid = params["mid_mlp"]["b"].astype(f32)
    w_comb = (wb @ w_emb).astype(bf16)
    b_comb = bb @ w_emb + b_mid
    fused = jax.lax.dot_general(h, w_comb, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32) + b_comb

    # recompute-backward path (pack_params_v3): two bf16 matmuls
    bneck = (jax.lax.dot_general(h, wb.astype(bf16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
             + bb).astype(bf16)
    unfused = jax.lax.dot_general(bneck, w_emb.astype(bf16),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32) + b_mid

    scale = float(jnp.max(jnp.abs(fused)))
    diff = float(jnp.max(jnp.abs(fused - unfused)))
    # bf16 has ~8 mantissa bits; the two paths differ by one extra
    # rounding of a 256-term contraction — allow 2^-7 relative
    assert diff <= 2.0 ** -7 * max(scale, 1.0), (diff, scale)


def test_backward_v4_matches_v3(setup):
    """The 2D-grid backward must produce identical grads to v3."""
    params, mc, g = setup
    d_out = jax.random.normal(jax.random.PRNGKey(5),
                              (N, fp.V3_OUT)).astype(jnp.bfloat16)
    packed = fp.pack_params_v3f(params)
    fo = _fout(params, mc, g)
    dmc3, dg3, dp3 = ft.field_backward_v3(packed, mc, g, d_out, fo, S,
                                          tile=TILE, interpret=True)
    dmc4, dg4, dp4 = ft.field_backward_v4(packed, mc, g, d_out, fo, S,
                                          tile=TILE, inner=2,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(dmc4), np.asarray(dmc3),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg4), np.asarray(dg3),
                               rtol=1e-5, atol=1e-5)
    for a3, a4 in zip(dp3, dp4):
        # fp32 accumulation reassociated across groups -> tiny noise
        np.testing.assert_allclose(np.asarray(a4), np.asarray(a3),
                                   rtol=1e-4, atol=1e-5)


def test_forward_v4_normals_match_analytic(setup):
    """v4's fused d preact/d mean must match get_analytic_normals."""
    params, mc, g = setup
    out = fp.field_forward_v4(fp.pack_params_v4f(params), mc, g, S,
                              tile=TILE, interpret=True)
    # v3 columns must be unchanged
    out3 = fp.field_forward_v3(fp.pack_params_v3f(params), mc, g, S,
                               tile=TILE, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :14], np.float32),
                               np.asarray(out3[:, :14], np.float32),
                               atol=2e-2, rtol=2e-2)
    dpdm = np.asarray(out[:, fp.V4_DPDM], np.float32)
    kernel_normals = -dpdm / np.maximum(
        np.linalg.norm(dpdm, axis=-1, keepdims=True), 1e-12)

    mean, cov = mc[:, :3], mc[:, 3:6]
    cfg = field_lib.FieldConfig(compute_dtype=jnp.bfloat16)
    ref = np.asarray(field_lib.get_analytic_normals(params, mean, cov,
                                                    cfg))
    # both are bf16 chains; compare directions loosely but require the
    # bulk to be tightly aligned
    dots = np.sum(kernel_normals * ref, axis=-1)
    assert np.median(dots) > 0.999, np.median(dots)
    assert np.mean(dots > 0.99) > 0.9, np.mean(dots > 0.99)


def test_forward_v5_pipelined_matches_v3_and_v4(setup):
    """The cross-grid-step pipelined schedule (v5) must be numerically
    IDENTICAL to v3 (and to v4 with want_normals): it reorders when the
    IPE front-end runs, not what it computes.  grid=2 here exercises
    the prologue, both parities, and the scratch carry."""
    params, mc, g = setup
    out3 = fp.field_forward_v3(fp.pack_params_v3f(params), mc, g, S,
                               tile=TILE, interpret=True)
    out5 = fp.field_forward_v5(fp.pack_params_v3f(params), mc, g, S,
                               tile=TILE, interpret=True)
    np.testing.assert_array_equal(np.asarray(out5, np.float32),
                                  np.asarray(out3, np.float32))
    out4 = fp.field_forward_v4(fp.pack_params_v4f(params), mc, g, S,
                               tile=TILE, interpret=True)
    out5n = fp.field_forward_v5(fp.pack_params_v4f(params), mc, g, S,
                                tile=TILE, want_normals=True,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(out5n, np.float32),
                                  np.asarray(out4, np.float32))


def test_custom_vjp_chain_end_to_end(setup):
    """grad through fused_field_train (interpret fwd+bwd) vs shadow."""
    params, mc, g = setup
    w_rand = jax.random.normal(jax.random.PRNGKey(4), (N, fp.V3_OUT))
    w_rand = w_rand.at[:, 14:20].set(0.0)  # sg aux cols (see above)

    # monkeypatch interpret mode into the vjp pair for CPU
    import functools
    orig_fwd = ft.field_forward_v3
    orig_bwd = ft.field_backward_v4
    fwd_i = functools.partial(orig_fwd, interpret=True)
    bwd_i = functools.partial(orig_bwd, interpret=True)
    fp_fwd_name, ft_bwd_name = "field_forward_v3", "field_backward_v4"
    setattr(ft, fp_fwd_name, fwd_i)
    setattr(ft, ft_bwd_name, bwd_i)
    try:
        def loss_k(p):
            out = ft.fused_field_train(p, mc, g, S, TILE)
            return jnp.sum(out.astype(jnp.float32) * w_rand)

        def loss_s(p):
            return jnp.sum(shadow(p, mc, g).astype(jnp.float32) * w_rand)

        gk = jax.grad(loss_k)(params)
        gs = jax.grad(loss_s)(params)
        np.testing.assert_allclose(np.asarray(gk["diff"]["w"]),
                                   np.asarray(gs["diff"]["w"]),
                                   atol=0.05, rtol=0.1)
        np.testing.assert_allclose(np.asarray(gk["trunk"][7]["w"]),
                                   np.asarray(gs["trunk"][7]["w"]),
                                   atol=0.1, rtol=0.1)
    finally:
        setattr(ft, fp_fwd_name, orig_fwd)
        setattr(ft, ft_bwd_name, orig_bwd)


def test_bwd_rays_per_tile_divides_forward_tile():
    """The backward tile must divide any multiple of the forward tile
    (the caller pads rows to the forward tile), need >=8 sublanes when
    possible, and keep the default configs on their tuned 1024-row
    tiles."""
    for spr in (8, 64, 96, 100, 128, 160, 256, 384):
        for base in (512, 1024, 2048, 4096):
            rays_fwd = max(8, base // spr)
            tile = spr * rays_fwd
            r = ft.bwd_rays_per_tile(tile, spr)
            assert rays_fwd % r == 0, (spr, base, rays_fwd, r)
            assert r >= 8 or r == rays_fwd, (spr, base, r)
            assert r * spr <= 2048 or r == rays_fwd, (spr, base, r)
    # tuned defaults (r5 folded backward, exp_r5_sweep): S=128/64 at
    # forward tile 2048 -> full 2048-row backward tiles
    assert ft.bwd_rays_per_tile(2048, 128) * 128 == 2048
    assert ft.bwd_rays_per_tile(2048, 64) * 64 == 2048


def test_backward_v4_rejects_non_dividing_tile(setup):
    """Non-divisible row counts must fail loudly, not silently
    truncate the grid (round-2 review finding)."""
    params, mc, g = setup
    packed = fp.pack_params_v3f(params)
    d_out = jnp.zeros((N, fp.V3_OUT), jnp.bfloat16)
    with pytest.raises(AssertionError):
        ft.field_backward_v4(packed, mc, g, d_out,
                             jnp.zeros((N, fp.V3_OUT), jnp.bfloat16), S,
                             tile=3 * S, interpret=True)  # 64 % 24 != 0


def test_custom_vjp_chain_non_dividing_sample_count():
    """samples_per_ray=96 (does not divide 1024): the fused path must
    produce correct gradients for every ray — the exact scenario where
    the old ray-unit clamp silently truncated the backward grid."""
    import functools
    spr, rays = 96, 21           # forward tile 2016 rows (21 rays)
    tile = spr * rays
    n = rays * spr
    params = field_lib.init_field_params(jax.random.PRNGKey(10))
    key = jax.random.PRNGKey(11)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1),
                                    (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], axis=-1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    g = fp.mid_g_bands(params, dirs)
    # selection must fall back to the full forward tile (no divisor of
    # 21 is >= 8), which always divides the padded row count
    assert ft.bwd_rays_per_tile(tile, spr) == rays

    # weight only the LAST ray's rows: under the old truncated grid
    # these rows were never written, so their gradient was garbage/zero
    w_rand = jnp.zeros((n, fp.V3_OUT))
    w_rand = w_rand.at[-spr:].set(
        jax.random.normal(jax.random.PRNGKey(12), (spr, fp.V3_OUT)))
    w_rand = w_rand.at[:, 14:20].set(0.0)  # sg aux cols

    orig_fwd, orig_bwd = ft.field_forward_v3, ft.field_backward_v4
    setattr(ft, "field_forward_v3",
            functools.partial(orig_fwd, interpret=True))
    setattr(ft, "field_backward_v4",
            functools.partial(orig_bwd, interpret=True))
    try:
        def loss_k(p):
            out = ft.fused_field_train(p, mc, g, spr, tile)
            return jnp.sum(out.astype(jnp.float32) * w_rand)

        def loss_s(p):
            return jnp.sum(shadow(p, mc, g, s=spr).astype(jnp.float32)
                           * w_rand)

        gk = jax.grad(loss_k)(params)
        gs = jax.grad(loss_s)(params)
        ref = np.abs(np.asarray(gs["trunk"][7]["w"])).max()
        assert ref > 0
        np.testing.assert_allclose(np.asarray(gk["trunk"][7]["w"]),
                                   np.asarray(gs["trunk"][7]["w"]),
                                   atol=max(0.1, 0.05 * ref), rtol=0.1)
        np.testing.assert_allclose(np.asarray(gk["diff"]["w"]),
                                   np.asarray(gs["diff"]["w"]),
                                   atol=0.05, rtol=0.1)
    finally:
        setattr(ft, "field_forward_v3", orig_fwd)
        setattr(ft, "field_backward_v4", orig_bwd)


def test_forward_v6_matches_v3_v4_and_spills_acts(setup):
    """v6 must be bit-identical to v3/v4 on the main output, and its
    spilled activations must equal the shadow's post-relu bf16 trunk."""
    params, mc, g = setup
    out3 = fp.field_forward_v3(fp.pack_params_v3f(params), mc, g, S,
                               tile=TILE, interpret=True)
    out6, acts6 = fp.field_forward_v6(fp.pack_params_v3f(params), mc, g,
                                      S, tile=TILE, interpret=True)
    np.testing.assert_array_equal(np.asarray(out6, np.float32),
                                  np.asarray(out3, np.float32))
    out4 = fp.field_forward_v4(fp.pack_params_v4f(params), mc, g, S,
                               tile=TILE, interpret=True)
    out6n, acts6n = fp.field_forward_v6(fp.pack_params_v4f(params), mc, g,
                                        S, tile=TILE, want_normals=True,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(out6n, np.float32),
                                  np.asarray(out4, np.float32))
    np.testing.assert_array_equal(np.asarray(acts6n, np.float32),
                                  np.asarray(acts6, np.float32))

    # shadow trunk: same IPE + 8 relu layers, bf16 (mirrors _field_half)
    A, bA, V, M = fp.ipe_matrices()
    packed = fp.pack_params_v3f(params)
    ws = packed[:8]
    bs = packed[8:16]
    pre = mc @ A + bA
    var = mc @ V
    x = (M * (jnp.exp(-0.5 * var) * jnp.sin(pre))
         + (1.0 - M) * pre).astype(jnp.bfloat16)
    h, hs = x, []
    for i in range(8):
        if i == fp.SKIP_AT:
            h = jnp.concatenate([x, h], axis=-1)
        acc = jax.lax.dot_general(h, ws[i], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + bs[i], 0.0).astype(jnp.bfloat16)
        hs.append(h)
    shadow_acts = jnp.concatenate(hs, axis=1)
    # the kernel's poly sin/exp2 differ from XLA's exact transcendentals
    # by <= a few bf16 ulps; downstream relu layers stay within bf16 noise
    np.testing.assert_allclose(np.asarray(acts6, np.float32),
                               np.asarray(shadow_acts, np.float32),
                               atol=0.15, rtol=0.05)


def test_backward_v5_matches_v4(setup):
    """The recompute-free backward must produce the same grads as the
    recompute backward when fed the v6-spilled activations (the spill
    IS the recompute's value, so only fp32 reassociation noise — and
    the poly-vs-exact transcendental difference in x — separates
    them; with the kernel's own acts the trunk parts are identical)."""
    params, mc, g = setup
    d_out = jax.random.normal(jax.random.PRNGKey(5),
                              (N, fp.V3_OUT)).astype(jnp.bfloat16)
    packed = fp.pack_params_v3f(params)
    _, acts = fp.field_forward_v6(fp.pack_params_v3f(params), mc, g, S,
                                  tile=TILE, interpret=True)
    fo = _fout(params, mc, g)
    dmc4, dg4, dp4 = ft.field_backward_v4(packed, mc, g, d_out, fo, S,
                                          tile=TILE, inner=2,
                                          interpret=True)
    dmc5, dg5, dp5 = ft.field_backward_v5(packed, mc, g, acts, d_out,
                                          fo, S,
                                          tile=TILE, inner=2,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(dmc5), np.asarray(dmc4),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dg5), np.asarray(dg4),
                               rtol=1e-4, atol=1e-4)
    for a4, a5 in zip(dp4, dp5):
        scale = max(1e-3, float(np.abs(np.asarray(a4)).max()))
        np.testing.assert_allclose(np.asarray(a5) / scale,
                                   np.asarray(a4) / scale,
                                   rtol=2e-3, atol=2e-3)


def test_custom_vjp_chain_save_acts_matches_recompute(setup):
    """End-to-end gradients through fused_field_train must be the same
    with save_acts on and off (same math, different activation
    source)."""
    import functools
    params, mc, g = setup
    w_rand = jax.random.normal(jax.random.PRNGKey(4), (N, fp.V3_OUT))

    patches = {
        "field_forward_v3": ft.field_forward_v3,
        "field_forward_v6": ft.field_forward_v6,
        "field_backward_v4": ft.field_backward_v4,
        "field_backward_v5": ft.field_backward_v5,
    }
    for name, orig in patches.items():
        setattr(ft, name, functools.partial(orig, interpret=True))
    try:
        def loss(p, save_acts):
            out = ft.fused_field_train(p, mc, g, S, TILE, False, save_acts)
            return jnp.sum(out.astype(jnp.float32) * w_rand)

        g_recompute = jax.grad(lambda p: loss(p, False))(params)
        g_acts = jax.grad(lambda p: loss(p, True))(params)
        flat_r, _ = jax.tree.flatten(g_recompute)
        flat_a, _ = jax.tree.flatten(g_acts)
        for a, r in zip(flat_a, flat_r):
            scale = max(1e-3, float(np.abs(np.asarray(r)).max()))
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(r) / scale,
                                       rtol=2e-3, atol=2e-3)
    finally:
        for name, orig in patches.items():
            setattr(ft, name, orig)


def test_backward_v6_noipe_matches_v5(setup):
    """The no-IPE backward (dead-dmc contract, x from the spill) must
    reproduce v5's dg/dpacked exactly up to the poly-vs-exact x
    difference already bounded by the v5-vs-v4 test."""
    params, mc, g = setup
    d_out = jax.random.normal(jax.random.PRNGKey(6),
                              (N, fp.V3_OUT)).astype(jnp.bfloat16)
    packed = fp.pack_params_v3f(params)
    _, acts = fp.field_forward_v6(fp.pack_params_v3f(params), mc, g, S,
                                  tile=TILE, interpret=True)
    _, xacts = fp.field_forward_v6(fp.pack_params_v3f(params), mc, g, S,
                                   tile=TILE, interpret=True, spill_x=True)
    # spill_x layout: the first ACTS_COLS are the plain acts, the tail
    # is the padded IPE encoding x
    np.testing.assert_array_equal(
        np.asarray(xacts[:, :fp.ACTS_COLS], np.float32),
        np.asarray(acts, np.float32))
    assert xacts.shape == (N, fp.XACTS_COLS)

    fo = _fout(params, mc, g)
    dmc5, dg5, dp5 = ft.field_backward_v5(packed, mc, g, acts, d_out,
                                          fo, S,
                                          tile=TILE, inner=2,
                                          interpret=True)
    dg6, dp6 = ft.field_backward_v6(packed, g, xacts, d_out, fo, S,
                                    tile=TILE, inner=2, interpret=True)
    np.testing.assert_allclose(np.asarray(dg6), np.asarray(dg5),
                               rtol=1e-4, atol=1e-4)
    for a5, a6 in zip(dp5, dp6):
        scale = max(1e-3, float(np.abs(np.asarray(a5)).max()))
        np.testing.assert_allclose(np.asarray(a6) / scale,
                                   np.asarray(a5) / scale,
                                   rtol=2e-3, atol=2e-3)


def test_custom_vjp_chain_no_dmc_matches_full(setup):
    """fused_field_train(want_dmc=False): parameter gradients equal the
    full path's, and the mean_cov cotangent comes back exactly zero
    (the caller contract says it is dead)."""
    import functools
    params, mc, g = setup
    w_rand = jax.random.normal(jax.random.PRNGKey(7), (N, fp.V3_OUT))

    patches = {
        "field_forward_v3": ft.field_forward_v3,
        "field_forward_v6": ft.field_forward_v6,
        "field_backward_v4": ft.field_backward_v4,
        "field_backward_v5": ft.field_backward_v5,
        "field_backward_v6": ft.field_backward_v6,
    }
    for name, orig in patches.items():
        setattr(ft, name, functools.partial(orig, interpret=True))
    try:
        def loss(p, m, want_dmc):
            out = ft.fused_field_train(p, m, g, S, TILE, False, True,
                                       want_dmc)
            return jnp.sum(out.astype(jnp.float32) * w_rand)

        (g_full, dmc_full) = jax.grad(
            lambda p, m: loss(p, m, True), argnums=(0, 1))(params, mc)
        (g_nodmc, dmc_nodmc) = jax.grad(
            lambda p, m: loss(p, m, False), argnums=(0, 1))(params, mc)
        assert float(jnp.abs(dmc_nodmc).max()) == 0.0
        assert float(jnp.abs(dmc_full).max()) > 0.0  # sanity: live here
        flat_f, _ = jax.tree.flatten(g_full)
        flat_n, _ = jax.tree.flatten(g_nodmc)
        for a, r in zip(flat_n, flat_f):
            scale = max(1e-3, float(np.abs(np.asarray(r)).max()))
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(r) / scale,
                                       rtol=2e-3, atol=2e-3)
    finally:
        for name, orig in patches.items():
            setattr(ft, name, orig)


def test_custom_vjp_chain_no_dmc_with_normals(setup):
    """The PRODUCTION fine-pass combination — want_normals=True (v4f
    packing, fused analytic-normals dgrad) + save_acts + want_dmc=False
    (spill_x + no-IPE backward) — must produce the same outputs as the
    plain v4 forward and the same parameter gradients as the full
    want_dmc=True path (the V4_DPDM cotangent columns are ignored by
    the backward in both)."""
    import functools
    params, mc, g = setup
    w_rand = jax.random.normal(jax.random.PRNGKey(8), (N, fp.V3_OUT))
    # zero cotangent on the dpdm columns (stop_gradient by construction
    # in the model; random cotangents there would be meaningless)
    w_rand = w_rand.at[:, 14:17].set(0.0)

    patches = {
        "field_forward_v3": ft.field_forward_v3,
        "field_forward_v6": ft.field_forward_v6,
        "field_backward_v4": ft.field_backward_v4,
        "field_backward_v5": ft.field_backward_v5,
        "field_backward_v6": ft.field_backward_v6,
    }
    for name, orig in patches.items():
        setattr(ft, name, functools.partial(orig, interpret=True))
    try:
        def loss(p, m, want_dmc):
            out = ft.fused_field_train(p, m, g, S, TILE, True, True,
                                       want_dmc)
            return jnp.sum(out.astype(jnp.float32) * w_rand)

        # forward value parity vs the plain v4 kernel (through jax.vjp
        # so the patched interpret-mode _fwd runs, not the primal)
        out_nodmc, _ = jax.vjp(
            lambda p: ft.fused_field_train(p, mc, g, S, TILE, True, True,
                                           False), params)
        out_v4 = fp.field_forward_v4(fp.pack_params_v4f(params), mc, g,
                                     S, tile=TILE, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_nodmc, np.float32),
                                      np.asarray(out_v4, np.float32))

        g_full = jax.grad(lambda p, m: loss(p, m, True))(params, mc)
        g_nodmc = jax.grad(lambda p, m: loss(p, m, False))(params, mc)
        flat_f, _ = jax.tree.flatten(g_full)
        flat_n, _ = jax.tree.flatten(g_nodmc)
        for a, r in zip(flat_n, flat_f):
            scale = max(1e-3, float(np.abs(np.asarray(r)).max()))
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(r) / scale,
                                       rtol=2e-3, atol=2e-3)
    finally:
        for name, orig in patches.items():
            setattr(ft, name, orig)


def test_forward_n_halves_variants_bit_identical(setup):
    """n_halves re-partitions the tile into independent row chunks —
    pure schedule, identical values required (the eval glue may pick a
    different halves count than the train path)."""
    params, mc, g = setup
    p3f = fp.pack_params_v3f(params)
    base = fp.field_forward_v3(p3f, mc, g, S, tile=TILE, interpret=True)
    for nh in (1, 4):
        out = fp.field_forward_v3(p3f, mc, g, S, tile=TILE,
                                  interpret=True, n_halves=nh)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(base, np.float32),
                                      err_msg=f"n_halves={nh}")
    d_out = jax.random.normal(jax.random.PRNGKey(9),
                              (N, fp.V3_OUT)).astype(jnp.bfloat16)
    packed = fp.pack_params_v3f(params)
    fo = _fout(params, mc, g)
    ref = ft.field_backward_v4(packed, mc, g, d_out, fo, S, tile=TILE,
                               inner=2, interpret=True)
    for nh in (1, 4):
        got = ft.field_backward_v4(packed, mc, g, d_out, fo, S,
                                   tile=TILE,
                                   inner=2, interpret=True, n_halves=nh)
        for a, b in zip(ref, got):
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_allclose(
                    np.asarray(y), np.asarray(x), rtol=2e-5, atol=2e-5)
