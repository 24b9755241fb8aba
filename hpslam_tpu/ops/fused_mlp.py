"""Pallas-fused NICER decoder trunks.

The mapping/tracking iteration cost is dominated not by FLOPs or HBM
bandwidth but by HLO op count: the two decoder trunks expand to ~1000
small XLA ops per optimizer step (measured via jax.profiler: 2+ GB of
activation round-trips and a long tail of sub-100us fusions; casting the
trunks to bf16 made iterations *slower*, confirming overhead-bound).
These kernels collapse each trunk forward and backward into ONE Pallas
program per pass: all weights live in VMEM (~0.5 MB), activations never
touch HBM, and the backward recomputes the forward block-wise (remat) and
accumulates weight gradients across the sequential TPU grid.

Architecture mirrored (reference src/conv_onet/models/decoder.py:108-342,
399-618; see models/decoder.py):
  geometry: sin Fourier embed (93) -> 5x[linear -> ReLU -> +fc_c(c)] with
    skip concat after block 2 -> linear -> occupancy logit.
  colour:   sin+cos Fourier embed (40) -> 5x[linear -> Softplus(100)
    -> +fc_c(c)] with skip concat -> linear -> raw rgb (sigmoid/exposure
    applied by the caller).

Round-2 status of the levers measured in the round-3 traces (one TPU
v5e chip, ScanNet op point):
  * DONE: the mapping iteration's compositor + losses + their backward
    are folded into one COMBINED loss+grad kernel per iteration
    (nicer_fused_maploss below) — colour 4.18 -> 3.89 ms/iter, geometry
    3.30 -> 2.65.  Two designs that did NOT work first: padding union
    feature rows to 128-lane slots (4x HBM on the dominant input — made
    the fused path slower) and a separate fwd kernel under custom_vjp
    (the bwd recomputes the forward anyway; merging them removed a
    0.73 ms launch).  A full mega-kernel with the feature table resident
    in VMEM stays blocked: Mosaic has no vectorized int-array indexing.
  * DONE but NOT DEFAULT (tracker): nicer_fused_trackloss runs the
    pose-differentiable render (weights in-kernel) as one kernel pair
    per iteration.  TPU measurement came back NEGATIVE: bench.py
    track_ms 452 fused vs 354 unfused (v5e, 2026-08-18) — the tracker
    iteration is small enough that XLA's own fusion wins; the kernel
    stays available behind tracking.fused_loss.
  * the union-cache scatter-add (0.75 ms, 80k rows) is row-serial on
    TPU; no cheaper formulation found so far (sort+cumsum costs more;
    tools_profile_scatter.py benchmarks the sorted segment-sum
    alternatives).  Geometry stages now move half the bytes (geo-only
    feature width).

Gradients produced: d(positions), d(c_geo), d(c_col), d(colour core
weights).  The geometry core and both Fourier B matrices are treated as
frozen (reference default: geometry decoders are never optimized,
point_slam.yaml:69-71; the learnable geo embedding only moves when the
geo decoder is unfrozen) — callers must fall back to the unfused path
when optimizing them (models/decoder.py eval_stage gates on
``cfg.fused_mlp and not opt_geo_dec``).
"""
from __future__ import annotations

import os
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Activation codes (static)
_RELU, _SOFTPLUS100 = 0, 1

_BN = 512  # fallback rows per grid step (used when padding is needed)


def _pick_bn(n: int, cap: int = 1024) -> int:
    """Largest row-block <= cap that divides n and is a multiple of 8 —
    avoids the pad+slice HBM copies of a ragged last block (measured
    ~0.8 ms/iter at the mapping operating point).  The forward kernel
    saves no activations, so it can take larger blocks (better MXU
    utilisation) than the backward (VMEM-bound by the saved layer
    inputs)."""
    for bn in range(min(cap, n), 7, -1):
        if n % bn == 0 and bn % 8 == 0:
            return bn
    return _BN


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (tests/CI run on CPU)."""
    d = jax.devices()[0]
    return "tpu" not in (d.platform + " " + d.device_kind).lower()


def _act(code: int, a):
    if code == _RELU:
        return jnp.maximum(a, 0.0)
    # Softplus(beta=100) with torch's threshold-20 clamp
    bx = 100.0 * a
    return jnp.where(bx > 20.0, a, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0)))
                     / 100.0)


def _dact(code: int, a):
    """activation'(a) from the PRE-activation a."""
    if code == _RELU:
        return (a > 0.0).astype(a.dtype)
    bx = 100.0 * a
    sig = jax.nn.sigmoid(jnp.minimum(bx, 20.0))
    return jnp.where(bx > 20.0, 1.0, sig)


def flatten_core(core) -> list:
    """Fixed flattening order: [W_i, b_i]*n + [F_i, f_i]*n + [Wout, bout]."""
    out = []
    for layer in core["layers"]:
        out += [layer["w"], layer["b"]]
    for fc in core["fc_c"]:
        out += [fc["w"], fc["b"]]
    out += [core["out"]["w"], core["out"]["b"]]
    return out


def unflatten_core_like(core, flat):
    it = iter(flat)
    layers = [{"w": next(it), "b": next(it)} for _ in core["layers"]]
    fc_c = [{"w": next(it), "b": next(it)} for _ in core["fc_c"]]
    return {"layers": layers, "fc_c": fc_c,
            "out": {"w": next(it), "b": next(it)}}


# Matmul operand dtype inside the kernels.  bf16 operands + f32
# accumulation is ONE MXU pass and matches the XLA path numerics (jnp.
# matmul on f32 inputs defaults to single-pass bf16 on TPU); f32 operands
# force the 3-pass decomposition (~3x MXU time) and are only used by the
# exact-equivalence tests (exact=True).


def _mm_for(exact: bool):
    if exact:
        return lambda x, W: jnp.dot(x, W,
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
    # default precision on f32 operands = ONE bf16 MXU pass with f32
    # accumulation; explicit bf16 casts measured SLOWER (extra VPU work)
    return lambda x, W: jnp.dot(x, W, preferred_element_type=jnp.float32)


def _trunk_fwd_block(e, c, ws, n_blocks: int, skip: int, act_code: int,
                     save=False, exact=False):
    """One trunk on a (BN, .) block.  ws = flat list (see flatten_core).

    Returns output (BN, out_dim); if save, also (pre-activations a_i list,
    layer inputs x_i list, final hidden h)."""
    _mm = _mm_for(exact)
    h = e
    a_saved, x_saved = [], []
    for i in range(n_blocks):
        W, b = ws[2 * i], ws[2 * i + 1]
        F, f = ws[2 * n_blocks + 2 * i], ws[2 * n_blocks + 2 * i + 1]
        if save:
            x_saved.append(h)
        a = _mm(h, W) + b
        if save:
            a_saved.append(a)
        h = _act(act_code, a)
        h = h + _mm(c, F) + f
        if i == skip:
            h = jnp.concatenate([e, h], axis=-1)
    Wout, bout = ws[-2], ws[-1]
    out = _mm(h, Wout) + bout
    if save:
        return out, (a_saved, x_saved, h)
    return out


def _trunk_bwd_block(g_out, e, c, ws, saved, n_blocks: int, skip: int,
                     act_code: int, exact=False):
    """Backward of one trunk block.

    Returns (d_e, d_c, d_ws flat list aligned with ws)."""
    _mm = _mm_for(exact)
    a_saved, x_saved, h_last = saved
    Wout = ws[-2]
    dWout = _mm(h_last.T, g_out)
    dbout = jnp.sum(g_out, axis=0)
    dh = _mm(g_out, Wout.T)
    d_e = jnp.zeros_like(e)
    d_c = jnp.zeros_like(c)
    dW = [None] * (2 * n_blocks)
    dF = [None] * (2 * n_blocks)
    for i in range(n_blocks - 1, -1, -1):
        if i == skip:
            # h was concat([e, r+fc]) after this block
            d_e = d_e + dh[:, : e.shape[1]]
            dh = dh[:, e.shape[1]:]
        W = ws[2 * i]
        F = ws[2 * n_blocks + 2 * i]
        # h_i = act(a_i) + (c F + f)
        d_c = d_c + _mm(dh, F.T)
        dF[2 * i] = _mm(c.T, dh)
        dF[2 * i + 1] = jnp.sum(dh, axis=0)
        da = dh * _dact(act_code, a_saved[i])
        dW[2 * i] = _mm(x_saved[i].T, da)
        dW[2 * i + 1] = jnp.sum(da, axis=0)
        dh = _mm(da, W.T)
    d_e = d_e + dh  # layer 0 input is the embedding
    return d_e, d_c, dW + dF + [dWout, dbout]


def _embed_geo(p, Bg):
    # HIGHEST precision: proj reaches ~1e2 radians (scale-25/32 Fourier
    # Bs); a bf16 pass loses the phase entirely (see decoder.fourier_
    # features).  K=3 keeps the 3-pass cost negligible.
    proj = jnp.dot(2.0 * math.pi * p, Bg,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return jnp.sin(proj), proj


def _embed_col(p, Bc):
    proj = jnp.dot(2.0 * math.pi * p, Bc,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1), proj


# ---------------------------------------------------------------------------
# in-kernel occupancy compositor (ops/composite.raw2outputs, occupancy
# mode, with the no-neighbour -100 forcing folded in).  S is static and
# small (N_surface=5): the cumulative products/suffix sums are unrolled
# Python loops over columns, which Mosaic handles as plain VPU ops.

def _comp_fwd(occ, rgb, z, pm, coef: float):
    """(n,S) occ logits, (n,S,3) rgb, (n,S) z, (n,S) bool pm ->
    (depth (n,), var (n,), color (n,3)) plus residuals for _comp_bwd."""
    S = occ.shape[1]
    occf = jnp.where(pm, occ, -100.0)
    a = jax.nn.sigmoid(coef * occf)
    ts = [jnp.ones_like(a[:, 0])]
    for s_i in range(1, S):
        ts.append(ts[-1] * (1.0 - a[:, s_i - 1] + 1e-10))
    t = jnp.stack(ts, 1)
    w = a * t
    wsum = jnp.sum(w, 1) + 1e-10
    color = jnp.sum(w[..., None] * rgb, 1) / wsum[:, None]
    depth = jnp.sum(w * z, 1) / wsum
    dv = z - depth[:, None]
    var = jnp.sum(w * dv * dv, 1)
    return depth, var, color, (a, t, w, wsum, depth, color, occf)


def _comp_bwd(res, z, rgb, pm, coef: float, dD, dVar, dC):
    """Backward of _comp_fwd wrt (occ, rgb); z/pm are constants."""
    a, t, w, wsum, depth, color, occf = res
    S = a.shape[1]
    dv = z - depth[:, None]
    # ddepth contribution of dVar (depth appears inside var)
    sum_wdv = jnp.sum(w * dv, 1)                       # (n,)
    dD_eff = dD + dVar * (-2.0 * sum_wdv)
    # d w_s
    dw = (dD_eff[:, None] * dv / wsum[:, None]
          + jnp.sum(dC[:, None, :] * (rgb - color[:, None, :]), -1)
          / wsum[:, None]
          + dVar[:, None] * dv * dv)
    # d rgb
    drgb = (dC[:, None, :] * (w / wsum[:, None])[..., None])
    # d a via w = a * t with t_u = prod_{j<u}(1 - a_j + 1e-10)
    da_cols = []
    suffix = jnp.zeros_like(a[:, 0])                   # sum_{u>s} dw_u w_u
    for s_i in range(S - 1, -1, -1):
        da_cols.append(dw[:, s_i] * t[:, s_i]
                       - suffix / (1.0 - a[:, s_i] + 1e-10))
        suffix = suffix + dw[:, s_i] * w[:, s_i]
    da = jnp.stack(da_cols[::-1], 1)
    docc = da * coef * a * (1.0 - a)
    docc = jnp.where(pm, docc, 0.0)
    return docc, drgb


# ---------------------------------------------------------------------------
# forward kernels


def _fwd_kernel(n_blocks, skip, n_geo, with_color, exact,
                p_ref, cg_ref, cc_ref, Bg_ref, Bc_ref, *refs):
    # refs: geo ws (n_geo), col ws (rest-2), then occ_ref, rgb_ref outputs
    occ_ref = refs[-2]
    rgb_ref = refs[-1]
    ws = [r[:] for r in refs[:-2]]
    gws, cws = ws[:n_geo], ws[n_geo:]
    p = p_ref[:]
    eg, _ = _embed_geo(p, Bg_ref[:])
    occ = _trunk_fwd_block(eg, cg_ref[:], gws, n_blocks, skip, _RELU,
                           exact=exact)
    occ_ref[:] = occ
    if with_color:
        ec, _ = _embed_col(p, Bc_ref[:])
        rgb = _trunk_fwd_block(ec, cc_ref[:], cws, n_blocks, skip,
                               _SOFTPLUS100, exact=exact)
        rgb_ref[:] = rgb
    else:
        rgb_ref[:] = jnp.zeros_like(rgb_ref)


def _bwd_kernel(n_blocks, skip, n_geo, with_color, need_col_wgrads, exact,
                need_dp,
                p_ref, cg_ref, cc_ref, Bg_ref, Bc_ref, *refs):
    """Backward: recompute forward with saves, then backprop.

    refs layout: [geo ws..., col ws..., gocc_ref, grgb_ref,
                  dp_ref, dcg_ref, dcc_ref, dcol_ws_refs...]
    Weight-grad outputs use a constant index_map, so the same VMEM block
    is revisited by every grid step — zero it at step 0, accumulate, and
    Pallas writes it back once at the end (sequential TPU grid).
    """
    idx = 0
    gws = [r[:] for r in refs[idx: idx + n_geo]]
    idx += n_geo
    n_colw = 2 * 2 * n_blocks + 2 if with_color else 0
    cws = [r[:] for r in refs[idx: idx + n_colw]]
    idx += n_colw
    gocc_ref = refs[idx]; idx += 1
    grgb_ref = refs[idx]; idx += 1
    dp_ref = refs[idx]; idx += 1
    dcg_ref = refs[idx]; idx += 1
    dcc_ref = refs[idx]; idx += 1
    dcol_refs = refs[idx:]

    p = p_ref[:]
    cg = cg_ref[:]
    Bg = Bg_ref[:]
    eg, proj_g = _embed_geo(p, Bg)
    occ, saved_g = _trunk_fwd_block(eg, cg, gws, n_blocks, skip, _RELU,
                                    save=True, exact=exact)
    d_eg, d_cg, _ = _trunk_bwd_block(gocc_ref[:], eg, cg, gws, saved_g,
                                     n_blocks, skip, _RELU, exact=exact)
    dcg_ref[:] = d_cg
    if need_dp:
        # d p from sin embedding: dproj = cos(proj) * d_e
        dproj_g = jnp.cos(proj_g) * d_eg
        dp = (2.0 * math.pi) * jnp.dot(
            dproj_g, Bg.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        # sample positions are phase constants for the mapper's union
        # path — skip the embedding backward (two 3-pass matmuls + the
        # cos() transcendentals per block)
        dp = jnp.zeros((p.shape[0], 3), jnp.float32)

    if with_color:
        cc = cc_ref[:]
        Bc = Bc_ref[:]
        ec, proj_c = _embed_col(p, Bc)
        rgb, saved_c = _trunk_fwd_block(ec, cc, cws, n_blocks, skip,
                                        _SOFTPLUS100, save=True,
                                        exact=exact)
        d_ec, d_cc, d_cws = _trunk_bwd_block(
            grgb_ref[:], ec, cc, cws, saved_c, n_blocks, skip,
            _SOFTPLUS100, exact=exact)
        dcc_ref[:] = d_cc
        if need_dp:
            m = proj_c.shape[-1]
            dproj_c = jnp.cos(proj_c) * d_ec[:, :m] \
                - jnp.sin(proj_c) * d_ec[:, m:]
            dp = dp + (2.0 * math.pi) * jnp.dot(
                dproj_c, Bc.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        if need_col_wgrads:
            first = pl.program_id(0) == 0
            for r, d in zip(dcol_refs, d_cws):
                d2 = d if d.ndim == 2 else d.reshape(1, -1)

                @pl.when(first)
                def _(r=r, d2=d2):
                    r[:] = d2

                @pl.when(jnp.logical_not(first))
                def _(r=r, d2=d2):
                    r[:] = r[:] + d2
    else:
        dcc_ref[:] = jnp.zeros_like(dcc_ref)
    dp_ref[:] = dp


def _fwd_comp_kernel(n_blocks, skip, n_geo, with_color, exact, S, coef,
                     sigmoid_rgb,
                     p_ref, cg_ref, cc_ref, z_ref, pm_ref, Bg_ref, Bc_ref,
                     *refs):
    """Trunks + occupancy compositor in ONE kernel (mapper union path).

    Block = bn_r whole rays = bn_r*S sample rows; refs = weights +
    [depth_ref, var_ref, color_ref (ray rows), occ_ref, rgb_ref (sample
    rows — residuals for the XLA-side compositor backward)]."""
    depth_ref, var_ref, color_ref = refs[-5], refs[-4], refs[-3]
    occ_ref, rgb_ref = refs[-2], refs[-1]
    ws = [r[:] for r in refs[:-5]]
    gws, cws = ws[:n_geo], ws[n_geo:]
    p = p_ref[:]
    bn_s = p.shape[0]
    bn_r = bn_s // S
    eg, _ = _embed_geo(p, Bg_ref[:])
    occ = _trunk_fwd_block(eg, cg_ref[:], gws, n_blocks, skip, _RELU,
                           exact=exact)[:, 0]
    if with_color:
        ec, _ = _embed_col(p, Bc_ref[:])
        rgb = _trunk_fwd_block(ec, cc_ref[:], cws, n_blocks, skip,
                               _SOFTPLUS100, exact=exact)
        if sigmoid_rgb:
            # encode_exposure=False composites SIGMOIDED per-sample rgb
            # (apply_color tail); deferred-exposure composites raw
            rgb = jax.nn.sigmoid(rgb)
    else:
        rgb = jnp.zeros((bn_s, 3), jnp.float32)
    pm = pm_ref[:] > 0.5
    d, v, c, _ = _comp_fwd(occ.reshape(bn_r, S), rgb.reshape(bn_r, S, 3),
                           z_ref[:], pm, coef)
    depth_ref[:] = d[:, None]
    var_ref[:] = v[:, None]
    color_ref[:] = c
    occ_ref[:] = occ[:, None]
    rgb_ref[:] = rgb


def _bwd_comp_kernel(n_blocks, skip, n_geo, with_color, need_wgrads, exact,
                     S, coef, sigmoid_rgb,
                     p_ref, cg_ref, cc_ref, z_ref, pm_ref, Bg_ref, Bc_ref,
                     *refs):
    """Backward of _fwd_comp_kernel: recompute trunks+compositor, chain
    the per-ray cotangents through the compositor into the trunks.

    refs = weights + [dD_ref, dV_ref, dC_ref] inputs (ray rows) +
    [dcg_ref, dcc_ref] sample-row outputs + optional col wgrad outputs
    (constant-index accumulation, see _bwd_kernel)."""
    idx = 0
    gws = [r[:] for r in refs[idx: idx + n_geo]]
    idx += n_geo
    n_colw = 2 * 2 * n_blocks + 2 if with_color else 0
    cws = [r[:] for r in refs[idx: idx + n_colw]]
    idx += n_colw
    dD_ref = refs[idx]; idx += 1
    dV_ref = refs[idx]; idx += 1
    dC_ref = refs[idx]; idx += 1
    dcg_ref = refs[idx]; idx += 1
    dcc_ref = refs[idx]; idx += 1
    dcol_refs = refs[idx:]

    p = p_ref[:]
    bn_s = p.shape[0]
    bn_r = bn_s // S
    cg = cg_ref[:]
    eg, _ = _embed_geo(p, Bg_ref[:])
    occ_out, saved_g = _trunk_fwd_block(eg, cg, gws, n_blocks, skip, _RELU,
                                        save=True, exact=exact)
    occ = occ_out[:, 0]
    if with_color:
        cc = cc_ref[:]
        ec, _ = _embed_col(p, Bc_ref[:])
        rgb_raw, saved_c = _trunk_fwd_block(ec, cc, cws, n_blocks, skip,
                                            _SOFTPLUS100, save=True,
                                            exact=exact)
        rgb = jax.nn.sigmoid(rgb_raw) if sigmoid_rgb else rgb_raw
    else:
        rgb = jnp.zeros((bn_s, 3), jnp.float32)
    pm = pm_ref[:] > 0.5
    z = z_ref[:]
    occ_r = occ.reshape(bn_r, S)
    rgb_r = rgb.reshape(bn_r, S, 3)
    _, _, _, res = _comp_fwd(occ_r, rgb_r, z, pm, coef)
    docc, drgb = _comp_bwd(res, z, rgb_r, pm, coef,
                           dD_ref[:][:, 0], dV_ref[:][:, 0], dC_ref[:])
    g_occ = docc.reshape(bn_s, 1)
    d_eg, d_cg, _ = _trunk_bwd_block(g_occ, eg, cg, gws, saved_g,
                                     n_blocks, skip, _RELU, exact=exact)
    dcg_ref[:] = d_cg
    if with_color:
        g_rgb = drgb.reshape(bn_s, 3)
        if sigmoid_rgb:
            sg = rgb.reshape(bn_s, 3)
            g_rgb = g_rgb * sg * (1.0 - sg)
        d_ec, d_cc, d_cws = _trunk_bwd_block(
            g_rgb, ec, cc, cws, saved_c, n_blocks, skip, _SOFTPLUS100,
            exact=exact)
        dcc_ref[:] = d_cc
        if need_wgrads:
            first = pl.program_id(0) == 0
            for r, d in zip(dcol_refs, d_cws):
                d2 = d if d.ndim == 2 else d.reshape(1, -1)

                @pl.when(first)
                def _(r=r, d2=d2):
                    r[:] = d2

                @pl.when(jnp.logical_not(first))
                def _(r=r, d2=d2):
                    r[:] = r[:] + d2
    else:
        dcc_ref[:] = jnp.zeros_like(dcc_ref)


# ---------------------------------------------------------------------------
# host-side wrappers

def _pad_rows(x, n_pad):
    if x.shape[0] == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)], 0)


@functools.partial(jax.jit, static_argnames=("n_blocks", "skip",
                                             "with_color", "exact"))
def _fused_fwd(p, c_geo, c_col, Bg, Bc, geo_flat, col_flat,
               n_blocks: int, skip: int, with_color: bool,
               exact: bool = False):
    n = p.shape[0]
    bn = _pick_bn(n, cap=2048)
    n_pad = -(-n // bn) * bn
    pp = _pad_rows(p, n_pad)
    cg = _pad_rows(c_geo, n_pad)
    cc = _pad_rows(c_col, n_pad)
    grid = (n_pad // bn,)

    def row_spec(width):
        return pl.BlockSpec((bn, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    w_all = list(geo_flat) + (list(col_flat) if with_color else [])
    # biases are 1-D; keep 2-D for VMEM tiling
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    kern = functools.partial(_fwd_kernel, n_blocks, skip, len(geo_flat),
                             with_color, exact)
    occ, rgb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec(3), row_spec(cg.shape[1]), row_spec(cc.shape[1]),
                  full_spec(Bg), full_spec(Bc)]
        + [full_spec(w) for w in w2],
        out_specs=[row_spec(1), row_spec(3)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 3), jnp.float32)],
        interpret=_interpret(),
    )(pp, cg, cc, Bg, Bc, *w2)
    return occ[:n, 0], rgb[:n]


@functools.partial(jax.jit, static_argnames=("n_blocks", "skip",
                                             "with_color",
                                             "need_col_wgrads", "exact",
                                             "need_dp"))
def _fused_bwd(p, c_geo, c_col, Bg, Bc, geo_flat, col_flat,
               g_occ, g_rgb, n_blocks: int, skip: int, with_color: bool,
               need_col_wgrads: bool, exact: bool = False,
               need_dp: bool = True):
    n = p.shape[0]
    # bwd saves all layer inputs/pre-activations per block; cap 1024 keeps
    # the kernel under VMEM (2048 crashes the compiler)
    bn = _pick_bn(n)
    n_pad = -(-n // bn) * bn
    pp = _pad_rows(p, n_pad)
    cg = _pad_rows(c_geo, n_pad)
    cc = _pad_rows(c_col, n_pad)
    go = _pad_rows(g_occ.reshape(-1, 1), n_pad)
    gr = _pad_rows(g_rgb, n_pad)
    grid = (n_pad // bn,)

    def row_spec(width):
        return pl.BlockSpec((bn, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    w_all = list(geo_flat) + (list(col_flat) if with_color else [])
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    col2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in col_flat]

    out_shapes = [jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),   # dp
                  jax.ShapeDtypeStruct((n_pad, cg.shape[1]), jnp.float32),
                  jax.ShapeDtypeStruct((n_pad, cc.shape[1]), jnp.float32)]
    out_specs = [row_spec(3), row_spec(cg.shape[1]), row_spec(cc.shape[1])]
    if need_col_wgrads:
        for w in col2:
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
            out_specs.append(full_spec(w))

    kern = functools.partial(_bwd_kernel, n_blocks, skip, len(geo_flat),
                             with_color, need_col_wgrads, exact, need_dp)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec(3), row_spec(cg.shape[1]), row_spec(cc.shape[1]),
                  full_spec(Bg), full_spec(Bc)]
        + [full_spec(w) for w in w2] + [row_spec(1), row_spec(3)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(pp, cg, cc, Bg, Bc, *w2, go, gr)
    dp = outs[0][:n]
    dcg = outs[1][:n]
    dcc = outs[2][:n]
    if need_col_wgrads:
        dcol = [d.reshape(w.shape) for d, w in zip(outs[3:], col_flat)]
    else:
        dcol = [jnp.zeros_like(w) for w in col_flat]
    return dp, dcg, dcc, dcol


# ---------------------------------------------------------------------------
# public custom-VJP ops

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def nicer_fused_color(p, c_geo, c_col, geo_core_flat, col_core_flat, Bs,
                      n_blocks: int, skip: int, exact: bool = False,
                      need_dp: bool = True, need_wgrads: bool = True):
    """(occ_logit (n,), raw rgb (n, 3)) for one colour stage.

    Differentiable in p, c_geo, c_col and the colour core weights; the
    geometry core and both Fourier Bs receive zero cotangents (frozen —
    see module docstring; callers must not use this path when optimizing
    them).
    """
    Bg, Bc = Bs
    return _fused_fwd(p, c_geo, c_col, Bg, Bc, tuple(geo_core_flat),
                      tuple(col_core_flat), n_blocks, skip, True,
                      exact=exact)


def _color_fwd(p, c_geo, c_col, geo_core_flat, col_core_flat, Bs,
               n_blocks, skip, exact=False, need_dp=True,
               need_wgrads=True):
    out = nicer_fused_color(p, c_geo, c_col, geo_core_flat, col_core_flat,
                            Bs, n_blocks, skip, exact, need_dp,
                            need_wgrads)
    return out, (p, c_geo, c_col, geo_core_flat, col_core_flat, Bs)


def _color_bwd(n_blocks, skip, exact, need_dp, need_wgrads, res, g):
    p, c_geo, c_col, geo_flat, col_flat, (Bg, Bc) = res
    g_occ, g_rgb = g
    dp, dcg, dcc, dcol = _fused_bwd(
        p, c_geo, c_col, Bg, Bc, tuple(geo_flat), tuple(col_flat),
        g_occ, g_rgb, n_blocks, skip, True, need_wgrads, exact=exact,
        need_dp=need_dp)
    dgeo = jax.tree.map(jnp.zeros_like, geo_flat)
    dcol = jax.tree.unflatten(jax.tree.structure(col_flat), dcol)
    return (dp, dcg, dcc, dgeo, dcol,
            (jnp.zeros_like(Bg), jnp.zeros_like(Bc)))


nicer_fused_color.defvjp(_color_fwd, _color_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def nicer_fused_geo(p, c_geo, geo_core_flat, Bg, n_blocks: int, skip: int,
                    exact: bool = False, need_dp: bool = True):
    """occ_logit (n,) for one geometry stage.  Differentiable in p and
    c_geo only (geometry core + B frozen, see module docstring)."""
    zc = jnp.zeros((p.shape[0], c_geo.shape[1]), jnp.float32)
    occ, _ = _fused_fwd(p, c_geo, zc, Bg, Bg, tuple(geo_core_flat), (),
                        n_blocks, skip, False, exact=exact)
    return occ


def _geo_fwd(p, c_geo, geo_core_flat, Bg, n_blocks, skip, exact=False,
             need_dp=True):
    occ = nicer_fused_geo(p, c_geo, geo_core_flat, Bg, n_blocks, skip,
                          exact, need_dp)
    return occ, (p, c_geo, geo_core_flat, Bg)


def _geo_bwd(n_blocks, skip, exact, need_dp, res, g_occ):
    p, c_geo, geo_flat, Bg = res
    zc = jnp.zeros((p.shape[0], c_geo.shape[1]), jnp.float32)
    zg = jnp.zeros((p.shape[0], 3), jnp.float32)
    dp, dcg, _, _ = _fused_bwd(
        p, c_geo, zc, Bg, Bg, tuple(geo_flat), (), g_occ, zg,
        n_blocks, skip, False, False, exact=exact, need_dp=need_dp)
    return dp, dcg, jax.tree.map(jnp.zeros_like, geo_flat), \
        jnp.zeros_like(Bg)


nicer_fused_geo.defvjp(_geo_fwd, _geo_bwd)


# ---------------------------------------------------------------------------
# composite-fused public op (mapper union path): trunks + occupancy
# compositor in one kernel pair.  Sample positions / z / pm are phase
# constants; differentiable in c_geo, c_col and (optionally) the colour
# core weights.

def _pick_bn_rays(n_rays: int, S: int, cap: int = None) -> int:
    if cap is None:
        cap = max(8, 1024 // S)
    for bn in range(min(cap, n_rays), 7, -1):
        if n_rays % bn == 0 and bn % 8 == 0 and (bn * S) % 8 == 0:
            return bn
    return 8


@functools.partial(jax.jit, static_argnames=(
    "n_blocks", "skip", "with_color", "S", "coef", "exact",
    "sigmoid_rgb"))
def _fused_comp_fwd(p, c_geo, c_col, z, pm, Bg, Bc, geo_flat, col_flat,
                    n_blocks: int, skip: int, with_color: bool, S: int,
                    coef: float, exact: bool = False,
                    sigmoid_rgb: bool = False):
    n_r = z.shape[0]
    bn_r = _pick_bn_rays(n_r, S)
    nr_pad = -(-n_r // bn_r) * bn_r
    ns_pad = nr_pad * S
    pp = _pad_rows(p, ns_pad)
    cg = _pad_rows(c_geo, ns_pad)
    cc = _pad_rows(c_col, ns_pad)
    zz = _pad_rows(z, nr_pad)
    pmf = _pad_rows(pm.astype(jnp.float32), nr_pad)
    grid = (nr_pad // bn_r,)

    def srow(width):
        return pl.BlockSpec((bn_r * S, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def rrow(width):
        return pl.BlockSpec((bn_r, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    w_all = list(geo_flat) + (list(col_flat) if with_color else [])
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    kern = functools.partial(_fwd_comp_kernel, n_blocks, skip,
                             len(geo_flat), with_color, exact, S, coef,
                             sigmoid_rgb)
    d, v, c, occ, rgb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[srow(3), srow(cg.shape[1]), srow(cc.shape[1]),
                  rrow(S), rrow(S), full_spec(Bg), full_spec(Bc)]
        + [full_spec(w) for w in w2],
        out_specs=[rrow(1), rrow(1), rrow(3), srow(1), srow(3)],
        out_shape=[jax.ShapeDtypeStruct((nr_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nr_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nr_pad, 3), jnp.float32),
                   jax.ShapeDtypeStruct((ns_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((ns_pad, 3), jnp.float32)],
        interpret=_interpret(),
    )(pp, cg, cc, zz, pmf, Bg, Bc, *w2)
    n_s = n_r * S
    return (d[:n_r, 0], v[:n_r, 0], c[:n_r],
            occ[:n_s, 0], rgb[:n_s])


@functools.partial(jax.jit, static_argnames=(
    "n_blocks", "skip", "with_color", "S", "coef", "need_wgrads", "exact",
    "sigmoid_rgb"))
def _fused_comp_bwd(p, c_geo, c_col, z, pm, Bg, Bc, geo_flat, col_flat,
                    dD, dV, dC, n_blocks: int, skip: int, with_color: bool,
                    S: int, coef: float, need_wgrads: bool,
                    exact: bool = False, sigmoid_rgb: bool = False):
    n_r = z.shape[0]
    bn_r = _pick_bn_rays(n_r, S)
    nr_pad = -(-n_r // bn_r) * bn_r
    ns_pad = nr_pad * S
    pp = _pad_rows(p, ns_pad)
    cg = _pad_rows(c_geo, ns_pad)
    cc = _pad_rows(c_col, ns_pad)
    zz = _pad_rows(z, nr_pad)
    pmf = _pad_rows(pm.astype(jnp.float32), nr_pad)
    gD = _pad_rows(dD.reshape(-1, 1), nr_pad)
    gV = _pad_rows(dV.reshape(-1, 1), nr_pad)
    gC = _pad_rows(dC, nr_pad)
    grid = (nr_pad // bn_r,)

    def srow(width):
        return pl.BlockSpec((bn_r * S, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def rrow(width):
        return pl.BlockSpec((bn_r, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    w_all = list(geo_flat) + (list(col_flat) if with_color else [])
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    col2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in col_flat]

    out_shapes = [jax.ShapeDtypeStruct((ns_pad, cg.shape[1]), jnp.float32),
                  jax.ShapeDtypeStruct((ns_pad, cc.shape[1]), jnp.float32)]
    out_specs = [srow(cg.shape[1]), srow(cc.shape[1])]
    if with_color and need_wgrads:
        for w in col2:
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
            out_specs.append(full_spec(w))

    kern = functools.partial(_bwd_comp_kernel, n_blocks, skip,
                             len(geo_flat), with_color, need_wgrads, exact,
                             S, coef, sigmoid_rgb)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[srow(3), srow(cg.shape[1]), srow(cc.shape[1]),
                  rrow(S), rrow(S), full_spec(Bg), full_spec(Bc)]
        + [full_spec(w) for w in w2] + [rrow(1), rrow(1), rrow(3)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(pp, cg, cc, zz, pmf, Bg, Bc, *w2, gD, gV, gC)
    n_s = n_r * S
    dcg = outs[0][:n_s]
    dcc = outs[1][:n_s]
    if with_color and need_wgrads:
        dcol = [d.reshape(w.shape) for d, w in zip(outs[2:], col_flat)]
        dcol = jax.tree.unflatten(jax.tree.structure(tuple(col_flat)),
                                  dcol)
    else:
        dcol = jax.tree.map(jnp.zeros_like, tuple(col_flat))
    return dcg, dcc, dcol


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def nicer_fused_composite(c_geo, c_col, p, z, pm, geo_core_flat,
                          col_core_flat, Bs, n_blocks: int, skip: int,
                          with_color: bool, S: int, coef: float,
                          need_wgrads: bool = True,
                          sigmoid_rgb: bool = False):
    """Trunks + occupancy compositor fused: returns (depth (n_r,),
    depth_var (n_r,), raw composited colour (n_r, 3)).

    Differentiable in c_geo, c_col and the colour core weights; p/z/pm
    (f32; pm as 0/1 floats) and the geometry core / Fourier Bs receive
    zero cotangents (phase constants / frozen — mapper union path only).

    Backward strategy: Mosaic rejects the fully-fused backward kernel
    (the ray-major -> sample-major cotangent relayout), so the VJP runs
    the small per-ray compositor backward in XLA on the forward's saved
    occ/rgb residuals and chains into the existing trunk backward kernel
    — the forward op-count win is kept, the compositor bwd stays ~12
    XLA ops."""
    Bg, Bc = Bs
    d, v, c, _occ, _rgb = _fused_comp_fwd(
        p, c_geo, c_col, z, pm, Bg, Bc,
        tuple(geo_core_flat), tuple(col_core_flat),
        n_blocks, skip, with_color, S, coef, sigmoid_rgb=sigmoid_rgb)
    return d, v, c


def _ncomp_fwd(c_geo, c_col, p, z, pm, geo_core_flat, col_core_flat, Bs,
               n_blocks, skip, with_color, S, coef, need_wgrads=True,
               sigmoid_rgb=False):
    Bg, Bc = Bs
    d, v, c, occ, rgb = _fused_comp_fwd(
        p, c_geo, c_col, z, pm, Bg, Bc,
        tuple(geo_core_flat), tuple(col_core_flat),
        n_blocks, skip, with_color, S, coef, sigmoid_rgb=sigmoid_rgb)
    return (d, v, c), (c_geo, c_col, p, z, pm, geo_core_flat,
                       col_core_flat, Bs, occ, rgb)


def _ncomp_bwd(n_blocks, skip, with_color, S, coef, need_wgrads,
               sigmoid_rgb, res, g):
    (c_geo, c_col, p, z, pm, geo_flat, col_flat, (Bg, Bc),
     occ, rgb) = res
    dD, dV, dC = g
    n_r = z.shape[0]
    pmb = pm > 0.5
    occ_r = occ.reshape(n_r, S)
    rgb_r = rgb.reshape(n_r, S, 3)
    _, _, _, comp_res = _comp_fwd(occ_r, rgb_r, z, pmb, coef)
    docc, drgb = _comp_bwd(comp_res, z, rgb_r, pmb, coef, dD, dV, dC)
    g_occ = docc.reshape(-1)
    g_rgb = drgb.reshape(-1, 3)
    if sigmoid_rgb and with_color:
        # rgb residual is POST-sigmoid; chain through it
        g_rgb = g_rgb * rgb * (1.0 - rgb)
    _dp, dcg, dcc, dcol = _fused_bwd(
        p, c_geo, c_col, Bg, Bc, tuple(geo_flat), tuple(col_flat),
        g_occ, g_rgb, n_blocks, skip, with_color,
        with_color and need_wgrads, need_dp=False)
    if not (with_color and need_wgrads):
        dcol = [jnp.zeros_like(w) for w in col_flat]
    dcol = jax.tree.unflatten(jax.tree.structure(tuple(col_flat)),
                              list(dcol) if not isinstance(dcol, tuple)
                              else list(dcol))
    return (dcg, dcc, jnp.zeros_like(p), jnp.zeros_like(z),
            jnp.zeros_like(pm),
            jax.tree.map(jnp.zeros_like, geo_flat), dcol,
            (jnp.zeros_like(Bg), jnp.zeros_like(Bc)))


nicer_fused_composite.defvjp(_ncomp_fwd, _ncomp_bwd)

# ---------------------------------------------------------------------------
# whole-iteration mapping loss kernels (union path): trunks + occupancy
# compositor + exposure affine + masked L1 losses in ONE kernel pair.
#
# The earlier fully-fused backward (_bwd_comp_kernel) was rejected by
# Mosaic on the ray-major -> sample-major cotangent relayout
# ((bn_r, S) -> (bn_r*S, 1) reshape).  These kernels avoid relayouts
# entirely: the packed cache row (pack_union_cache) arrives RAY-major,
# and the per-sample stacks are built SLICE-major in-kernel from static
# column slices + sublane concats (sample s of every ray is rows
# [s*bn : (s+1)*bn]) — every intermediate is a plain 2D block, and the
# compositor works on static row slices, never reshaping across the
# sublane/lane boundary.
#
# Inputs per grid step (bn rays):
#   row    (bn, D)       packed phase-constants [z S | pts 3S | rays_d 3 |
#                        d_gt 1 | c_gt 3 | pm S | Wm S*u | uids u]
#   ufeat  (bn, u*fs)    per-ray union feature rows (gathered in XLA —
#                        Mosaic has no vectorized int indexing); fs = 2C
#                        with colour, C (geo half only) without
#   okf    (bn, 1)       (d_gt > 0) & inside  as 0/1 floats
#   aff    (bn, 12)      per-ray exposure affine rows (row-major 3x3 | 3)
# The grad path runs ONE combined kernel (_maploss_bwd_kernel) producing
# the loss accumulators AND d_ufeat (bn, u*fs), d_aff (bn, 12) and the
# col-core wgrads — custom_vjp's fwd rule calls it and stashes the grads
# as residuals, so no separate forward launch ever runs under grad (the
# fwd-only kernel below serves undifferentiated primal calls).  The Wm
# mixing (interpolate.union_gather) and its backward run in-kernel too,
# so the only per-iteration XLA ops left are the two row gathers, the
# d_ufeat scatter-add, the affine-table build, and Adam.


def _canon(x):
    """Force canonical (offset-0) vector layout via an identity matmul.

    (bn, 1) lane-slices inherit their parent column's lane offset; Mosaic
    relayouts mismatched ELEMENTWISE operands but rejects dim-0 concats
    whose operands sit at different lane offsets ("offset mismatch on
    non-concat dimension").  Matmul outputs are always canonically laid
    out and x @ I is exact in f32, so this is a layout cast, not math."""
    k = x.shape[-1]
    return jnp.dot(x, jnp.eye(k, dtype=jnp.float32),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _maploss_row_offsets(S: int, u: int):
    o_z = 0
    o_pts = S
    o_rd = 4 * S
    o_dgt = 4 * S + 3
    o_cgt = 4 * S + 4
    o_pm = 4 * S + 7
    o_wm = 5 * S + 7
    return o_z, o_pts, o_dgt, o_cgt, o_pm, o_wm


def _maploss_common(n_blocks, skip, n_geo, with_color, exact, S, u, C,
                    coef, sigmoid_rgb, use_affine,
                    row, uf, okf, aff, Bg, Bc, gws, cws, save=False):
    """Shared forward computation for the maploss kernel pair.

    Returns per-ray depth/color, compositor internals and (if save) the
    trunk residuals needed by the backward."""
    bn = row.shape[0]
    o_z, o_pts, o_dgt, o_cgt, o_pm, o_wm = _maploss_row_offsets(S, u)
    z = row[:, o_z:o_z + S]                                  # (bn, S)
    d_gt = row[:, o_dgt:o_dgt + 1]                           # (bn, 1)
    c_gt = row[:, o_cgt:o_cgt + 3]
    pm = row[:, o_pm:o_pm + S]
    Wm = row[:, o_wm:o_wm + S * u]

    # slice-major sample stacks from static column slices.  The Fourier
    # embeds run PER SLICE and the embeddings are concatenated instead of
    # the raw position slices: tpu.concatenate requires equal lane
    # offsets, which row[:, 3s:3s+3] slices do not have, while matmul
    # outputs are always canonically laid out.
    eg_parts, pc_parts = [], []
    for s in range(S):
        p_s = row[:, o_pts + 3 * s:o_pts + 3 * s + 3]
        pg = jnp.dot(2.0 * math.pi * p_s, Bg,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        eg_parts.append(jnp.sin(pg))
        if with_color:
            pc = jnp.dot(2.0 * math.pi * p_s, Bc,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
            pc_parts.append(jnp.concatenate([jnp.sin(pc), jnp.cos(pc)],
                                            -1))
    # union feature mix (interpolate.union_gather) per slice.  ``uf``
    # stays in the packed (bn, u*fstride) layout ([geo C | col C] per
    # union id with colour, geo-only without — geometry stages then move
    # half the gather/scatter bytes); mixed-lane-offset slices are fine
    # in ELEMENTWISE ops (Mosaic relayouts them), and the dim-0 concat
    # operands are canonicalized via _canon, so no padded copy of the
    # feature rows is ever materialized (the earlier 128-lane-slot
    # padding cost 4x the HBM traffic on the dominant per-iteration
    # input and made the fused path SLOWER than the unfused chain).
    fstride = 2 * C if with_color else C
    cg_s, cc_s = [], []
    for s in range(S):
        accg = jnp.zeros((bn, C), jnp.float32)
        accc = jnp.zeros((bn, C), jnp.float32) if with_color else None
        for j in range(u):
            wj = Wm[:, s * u + j:s * u + j + 1]
            accg = accg + wj * uf[:, j * fstride:j * fstride + C]
            if with_color:
                accc = accc + wj * uf[:, j * fstride + C:
                                      (j + 1) * fstride]
        pm_s = pm[:, s:s + 1] > 0.5
        cg_s.append(_canon(jnp.where(pm_s, accg, 0.0)))
        if with_color:
            cc_s.append(_canon(jnp.where(pm_s, accc, 0.0)))
    cg_all = jnp.concatenate(cg_s, 0)                        # (S*bn, C)
    cc_all = jnp.concatenate(cc_s, 0) if with_color else None

    eg = jnp.concatenate(eg_parts, 0)
    occ_out = _trunk_fwd_block(eg, cg_all, gws, n_blocks, skip, _RELU,
                               save=save, exact=exact)
    occ_all, saved_g = occ_out if save else (occ_out, None)
    if with_color:
        ec = jnp.concatenate(pc_parts, 0)
        rgb_out = _trunk_fwd_block(ec, cc_all, cws, n_blocks, skip,
                                   _SOFTPLUS100, save=save, exact=exact)
        rgb_raw, saved_c = rgb_out if save else (rgb_out, None)
        rgb_all = jax.nn.sigmoid(rgb_raw) if sigmoid_rgb else rgb_raw
    else:
        ec = saved_c = None
        rgb_all = jnp.zeros((S * bn, 3), jnp.float32)

    # occupancy compositor on static row slices (ops/composite.raw2outputs
    # occupancy mode; -100 no-neighbour forcing)
    a_s, t_s, w_s = [], [], []
    t_run = jnp.ones((bn, 1), jnp.float32)
    for s in range(S):
        occ_s = jnp.where(pm[:, s:s + 1] > 0.5,
                          occ_all[s * bn:(s + 1) * bn], -100.0)
        a = jax.nn.sigmoid(coef * occ_s)
        a_s.append(a)
        t_s.append(t_run)
        w_s.append(a * t_run)
        t_run = t_run * (1.0 - a + 1e-10)
    wsum = sum(w_s) + 1e-10
    depth = sum(w * z[:, s:s + 1] for s, w in enumerate(w_s)) / wsum
    color_raw = sum(w_s[s] * rgb_all[s * bn:(s + 1) * bn]
                    for s in range(S)) / wsum                # (bn, 3)

    if use_affine and with_color:
        lin = [sum(color_raw[:, c:c + 1] * aff[:, 3 * c + d:3 * c + d + 1]
                   for c in range(3)) + aff[:, 9 + d:9 + d + 1]
               for d in range(3)]
        lin = jnp.concatenate(lin, 1)
        color = jax.nn.sigmoid(lin)
    else:
        color = color_raw

    # mask = (d_gt>0) & inside & vmask & isfinite(depth)
    nn_cnt = sum((pm[:, s:s + 1] > 0.5).astype(jnp.float32)
                 for s in range(S))
    vmask = nn_cnt >= float(int(S / 2 + 1))
    mask = (okf > 0.5) & vmask & jnp.isfinite(depth)
    comp = dict(z=z, d_gt=d_gt, c_gt=c_gt, pm=pm, Wm=Wm, a_s=a_s, t_s=t_s,
                w_s=w_s, wsum=wsum, depth=depth, color_raw=color_raw,
                color=color, mask=mask, eg=eg, ec=ec, cg_all=cg_all,
                cc_all=cc_all, rgb_all=rgb_all, saved_g=saved_g,
                saved_c=saved_c)
    return comp


def _maploss_fwd_kernel(n_blocks, skip, n_geo, with_color, exact, S, u, C,
                        coef, sigmoid_rgb, use_affine, w_color,
                        row_ref, uf_ref, okf_ref, aff_ref, Bg_ref, Bc_ref,
                        *refs):
    gl_ref, cl_ref = refs[-2], refs[-1]
    ws = [r[:] for r in refs[:-2]]
    gws, cws = ws[:n_geo], ws[n_geo:]
    comp = _maploss_common(
        n_blocks, skip, n_geo, with_color, exact, S, u, C, coef,
        sigmoid_rgb, use_affine, row_ref[:], uf_ref[:], okf_ref[:],
        aff_ref[:], Bg_ref[:], Bc_ref[:], gws, cws, save=False)
    mask = comp["mask"]
    # 2D keepdims reductions: Mosaic cannot store scalars to VMEM
    gl = jnp.sum(jnp.where(mask, jnp.abs(comp["d_gt"] - comp["depth"]),
                           0.0), axis=0, keepdims=True)          # (1, 1)
    cl = (jnp.sum(jnp.sum(jnp.where(
        mask, jnp.abs(comp["c_gt"] - comp["color"]), 0.0),
        axis=0, keepdims=True), axis=1, keepdims=True)
        if with_color else jnp.zeros((1, 1), jnp.float32))
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        gl_ref[:] = gl
        cl_ref[:] = cl

    @pl.when(jnp.logical_not(first))
    def _():
        gl_ref[:] = gl_ref[:] + gl
        cl_ref[:] = cl_ref[:] + cl


def _maploss_bwd_kernel(n_blocks, skip, n_geo, with_color, need_wgrads,
                        exact, S, u, C, coef, sigmoid_rgb, use_affine,
                        w_color,
                        row_ref, uf_ref, okf_ref, aff_ref, Bg_ref, Bc_ref,
                        *refs):
    """Combined loss + gradient kernel: one launch computes the masked L1
    losses AND every cotangent.  custom_vjp runs fwd then bwd; a separate
    fwd kernel would recompute the whole forward a second time (measured
    0.73 ms/iter of the 3.6 ms mapping iteration), so the vjp fwd rule
    calls THIS kernel once and stashes the grads as residuals."""
    idx = 0
    gws = [r[:] for r in refs[idx:idx + n_geo]]
    idx += n_geo
    n_colw = 2 * 2 * n_blocks + 2 if with_color else 0
    cws = [r[:] for r in refs[idx:idx + n_colw]]
    idx += n_colw
    gl_ref = refs[idx]; idx += 1
    cl_ref = refs[idx]; idx += 1
    duf_ref = refs[idx]; idx += 1
    daff_ref = refs[idx]; idx += 1
    dcol_refs = refs[idx:]

    row = row_ref[:]
    uf = uf_ref[:]
    aff = aff_ref[:]
    bn = row.shape[0]
    comp = _maploss_common(
        n_blocks, skip, n_geo, with_color, exact, S, u, C, coef,
        sigmoid_rgb, use_affine, row, uf, okf_ref[:], aff,
        Bg_ref[:], Bc_ref[:], gws, cws, save=True)
    mask = comp["mask"]
    z, pm, Wm = comp["z"], comp["pm"], comp["Wm"]
    wsum, depth = comp["wsum"], comp["depth"]
    a_s, t_s, w_s = comp["a_s"], comp["t_s"], comp["w_s"]
    maskf = mask.astype(jnp.float32)

    # loss partials (2D keepdims: Mosaic cannot store scalars to VMEM)
    gl = jnp.sum(jnp.where(mask, jnp.abs(comp["d_gt"] - comp["depth"]),
                           0.0), axis=0, keepdims=True)          # (1, 1)
    cl = (jnp.sum(jnp.sum(jnp.where(
        mask, jnp.abs(comp["c_gt"] - comp["color"]), 0.0),
        axis=0, keepdims=True), axis=1, keepdims=True)
        if with_color else jnp.zeros((1, 1), jnp.float32))
    first_step = pl.program_id(0) == 0

    @pl.when(first_step)
    def _():
        gl_ref[:] = gl
        cl_ref[:] = cl

    @pl.when(jnp.logical_not(first_step))
    def _():
        gl_ref[:] = gl_ref[:] + gl
        cl_ref[:] = cl_ref[:] + cl

    # loss cotangents (dL = 1): geometry L1 + w_color * colour L1
    g_depth = -jnp.sign(comp["d_gt"] - comp["depth"]) * maskf
    if with_color:
        g_color = -jnp.sign(comp["c_gt"] - comp["color"]) * maskf \
            * w_color
        if use_affine:
            sg = comp["color"]
            g_lin = g_color * sg * (1.0 - sg)
            daff_cols = []
            g_craw = []
            for c in range(3):
                acc = jnp.zeros((bn, 1), jnp.float32)
                for d in range(3):
                    acc = acc + g_lin[:, d:d + 1] \
                        * aff[:, 3 * c + d:3 * c + d + 1]
                g_craw.append(acc)
            g_craw = jnp.concatenate(g_craw, 1)
            for c in range(3):
                for d in range(3):
                    daff_cols.append(g_lin[:, d:d + 1]
                                     * comp["color_raw"][:, c:c + 1])
            daff_cols += [g_lin[:, d:d + 1] for d in range(3)]
            daff_ref[:] = jnp.concatenate(daff_cols, 1)
        else:
            g_craw = g_color
            daff_ref[:] = jnp.zeros_like(daff_ref)
    else:
        g_craw = jnp.zeros((bn, 3), jnp.float32)
        daff_ref[:] = jnp.zeros_like(daff_ref)

    # compositor backward on slices (matches ops/composite semantics; no
    # depth-variance term in the mapping loss)
    rgb_s = [comp["rgb_all"][s * bn:(s + 1) * bn] for s in range(S)]
    dw_s = []
    for s in range(S):
        dv = z[:, s:s + 1] - depth
        dcol_term = jnp.sum(g_craw * (rgb_s[s] - comp["color_raw"]), 1,
                            keepdims=True)
        dw_s.append((g_depth * dv + dcol_term) / wsum)
    suffix = jnp.zeros((bn, 1), jnp.float32)
    da_s = [None] * S
    for s in range(S - 1, -1, -1):
        da_s[s] = dw_s[s] * t_s[s] - suffix / (1.0 - a_s[s] + 1e-10)
        suffix = suffix + dw_s[s] * w_s[s]
    docc_s, drgb_s = [], []
    for s in range(S):
        pm_s = pm[:, s:s + 1] > 0.5
        docc = da_s[s] * coef * a_s[s] * (1.0 - a_s[s])
        docc_s.append(_canon(jnp.where(pm_s, docc, 0.0)))
        drgb_s.append(_canon(g_craw * (w_s[s] / wsum)))
    g_occ = jnp.concatenate(docc_s, 0)                       # (S*bn, 1)

    d_eg, d_cg, _ = _trunk_bwd_block(g_occ, comp["eg"], comp["cg_all"],
                                     gws, comp["saved_g"], n_blocks, skip,
                                     _RELU, exact=exact)
    if with_color:
        g_rgb = jnp.concatenate(drgb_s, 0)                   # (S*bn, 3)
        if sigmoid_rgb:
            sg_all = comp["rgb_all"]
            g_rgb = g_rgb * sg_all * (1.0 - sg_all)
        d_ec, d_cc, d_cws = _trunk_bwd_block(
            g_rgb, comp["ec"], comp["cc_all"], cws, comp["saved_c"],
            n_blocks, skip, _SOFTPLUS100, exact=exact)
        if need_wgrads:
            first = pl.program_id(0) == 0
            for r, dws in zip(dcol_refs, d_cws):
                d2 = dws if dws.ndim == 2 else dws.reshape(1, -1)

                @pl.when(first)
                def _(r=r, d2=d2):
                    r[:] = d2

                @pl.when(jnp.logical_not(first))
                def _(r=r, d2=d2):
                    r[:] = r[:] + d2
    else:
        d_cc = None

    # union-mix backward: d_ufeat[:, j] = sum_s Wm[:, s*u+j] * dacc_s
    # (Wm itself is a phase constant — no cotangent).  Output matches the
    # packed uf layout the feature scatter-add consumes (geo-only when
    # with_color is off).
    dg_s, dc_s = [], []
    for s in range(S):
        pm_s = pm[:, s:s + 1] > 0.5
        dg_s.append(jnp.where(pm_s, d_cg[s * bn:(s + 1) * bn], 0.0))
        if with_color:
            dc_s.append(jnp.where(pm_s, d_cc[s * bn:(s + 1) * bn], 0.0))
    duf_cols = []
    for j in range(u):
        accg = jnp.zeros((bn, C), jnp.float32)
        accc = jnp.zeros((bn, C), jnp.float32) if with_color else None
        for s in range(S):
            wj = Wm[:, s * u + j:s * u + j + 1]
            accg = accg + wj * dg_s[s]
            if with_color:
                accc = accc + wj * dc_s[s]
        duf_cols.append(accg)
        if with_color:
            duf_cols.append(accc)
    duf_ref[:] = jnp.concatenate(duf_cols, 1)


def _maploss_specs(D, uf_w, bn, Bg, Bc, w2):
    def rrow(width):
        return pl.BlockSpec((bn, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [rrow(D), rrow(uf_w), rrow(1), rrow(12),
                full_spec(Bg), full_spec(Bc)] \
        + [full_spec(w) for w in w2]
    return rrow, full_spec, in_specs


@functools.partial(jax.jit, static_argnames=(
    "n_blocks", "skip", "with_color", "S", "u", "C", "coef",
    "sigmoid_rgb", "use_affine", "w_color", "exact"))
def _maploss_fwd(row, uf, okf, aff, Bg, Bc, geo_flat, col_flat,
                 n_blocks: int, skip: int, with_color: bool, S: int,
                 u: int, C: int, coef: float, sigmoid_rgb: bool,
                 use_affine: bool, w_color: float, exact: bool = False):
    n_r, D = row.shape
    bn = _pick_bn_rays(n_r, S)
    nr_pad = -(-n_r // bn) * bn
    rowp = _pad_rows(row, nr_pad)
    ufp = _pad_rows(uf, nr_pad)
    # padded rays must not contribute: zero ok mask
    okp = _pad_rows(okf, nr_pad)
    affp = _pad_rows(aff, nr_pad)
    grid = (nr_pad // bn,)
    w_all = list(geo_flat) + (list(col_flat) if with_color else [])
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    rrow, full_spec, in_specs = _maploss_specs(D, uf.shape[1], bn, Bg,
                                                Bc, w2)
    acc_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_maploss_fwd_kernel, n_blocks, skip,
                             len(geo_flat), with_color, exact, S, u, C,
                             coef, sigmoid_rgb, use_affine, w_color)
    gl, cl = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=[acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 2,
        interpret=_interpret(),
    )(rowp, ufp, okp, affp, Bg, Bc, *w2)
    return gl[0, 0], cl[0, 0]


@functools.partial(jax.jit, static_argnames=(
    "n_blocks", "skip", "with_color", "S", "u", "C", "coef",
    "sigmoid_rgb", "use_affine", "w_color", "need_wgrads", "exact"))
def _maploss_bwd(row, uf, okf, aff, Bg, Bc, geo_flat, col_flat,
                 n_blocks: int, skip: int, with_color: bool, S: int,
                 u: int, C: int, coef: float, sigmoid_rgb: bool,
                 use_affine: bool, w_color: float, need_wgrads: bool,
                 exact: bool = False):
    n_r, D = row.shape
    # smaller ray block than fwd: the bwd also holds the saved trunk
    # activations + both cotangent stacks (bn=200 hit the 16M scoped
    # VMEM limit at ScanNet dims).  Unlike fwd we don't insist bn
    # divides n_r — grid-step count matters more than a few padded rows.
    # Measured at the ScanNet colour op point (v5e): bn 64 -> 3.53,
    # 96 -> 3.41, 128 -> 3.29, 160 -> 3.33 ms/iter, 200 -> compile crash;
    # default 128.
    bn = min(max(8, int(os.environ.get("HPSLAM_MAPLOSS_BN", ((640 // S) // 8) * 8))), -(-n_r // 8) * 8)
    nr_pad = -(-n_r // bn) * bn
    rowp = _pad_rows(row, nr_pad)
    ufp = _pad_rows(uf, nr_pad)
    okp = _pad_rows(okf, nr_pad)
    affp = _pad_rows(aff, nr_pad)
    grid = (nr_pad // bn,)
    w_all = list(geo_flat) + (list(col_flat) if with_color else [])
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    col2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in col_flat]
    rrow, full_spec, in_specs = _maploss_specs(D, uf.shape[1], bn, Bg,
                                                Bc, w2)
    acc_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [acc_spec, acc_spec, rrow(uf.shape[1]), rrow(12)]
    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.float32),
                  jax.ShapeDtypeStruct((1, 1), jnp.float32),
                  jax.ShapeDtypeStruct((nr_pad, uf.shape[1]), jnp.float32),
                  jax.ShapeDtypeStruct((nr_pad, 12), jnp.float32)]
    if with_color and need_wgrads:
        for w in col2:
            out_specs.append(full_spec(w))
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    kern = functools.partial(_maploss_bwd_kernel, n_blocks, skip,
                             len(geo_flat), with_color,
                             with_color and need_wgrads, exact, S, u, C,
                             coef, sigmoid_rgb, use_affine, w_color)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shapes,
        interpret=_interpret(),
    )(rowp, ufp, okp, affp, Bg, Bc, *w2)
    gl, cl = outs[0][0, 0], outs[1][0, 0]
    duf = outs[2][:n_r]
    daff = outs[3][:n_r]
    if with_color and need_wgrads:
        dcol = [d.reshape(w.shape) for d, w in zip(outs[4:], col_flat)]
    else:
        dcol = [jnp.zeros_like(w) for w in col_flat]
    return gl, cl, duf, daff, dcol


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12,
                                                    13, 14, 15, 16, 17))
def nicer_fused_maploss(uf, aff, col_core_flat, row, okf, geo_core_flat,
                        Bs, n_blocks: int, skip: int, with_color: bool,
                        S: int, u: int, C: int, coef: float,
                        sigmoid_rgb: bool, use_affine: bool,
                        w_color: float, need_wgrads: bool = True):
    """Whole-iteration fused mapping objective (union path).

    Returns (geo_loss, col_loss) scalars; the total optimized loss is
    geo_loss + w_color * col_loss (the backward assumes unit cotangent on
    that combination — matching mapper.stage_loss).  Differentiable in the
    union feature rows ``uf`` (n, u*2C), the per-ray exposure affine rows
    ``aff`` (n, 12) and (need_wgrads) the colour core weights; the packed
    cache row, ok mask, geometry core and Fourier Bs are phase constants.
    """
    Bg, Bc = Bs
    gl, cl = _maploss_fwd(row, uf, okf, aff, Bg, Bc,
                          tuple(geo_core_flat), tuple(col_core_flat),
                          n_blocks, skip, with_color, S, u, C, coef,
                          sigmoid_rgb, use_affine, w_color)
    return gl, cl


def _nml_fwd(uf, aff, col_core_flat, row, okf, geo_core_flat, Bs,
             n_blocks, skip, with_color, S, u, C, coef, sigmoid_rgb,
             use_affine, w_color, need_wgrads=True):
    # the combined kernel produces losses AND all cotangents in one
    # launch; stash the grads as residuals so the bwd rule is only a
    # cotangent scale (a separate fwd kernel would re-run the whole
    # forward — measured 0.73 ms/iter of a 3.6 ms mapping iteration)
    Bg, Bc = Bs
    gl, cl, duf, daff, dcol = _maploss_bwd(
        row, uf, okf, aff, Bg, Bc, tuple(geo_core_flat),
        tuple(col_core_flat), n_blocks, skip, with_color, S, u, C, coef,
        sigmoid_rgb, use_affine, w_color, need_wgrads)
    return (gl, cl), (duf, daff, dcol, row, okf, geo_core_flat, (Bg, Bc))


def _nml_bwd(n_blocks, skip, with_color, S, u, C, coef, sigmoid_rgb,
             use_affine, w_color, need_wgrads, res, g):
    (duf, daff, dcol, row, okf, geo_core_flat, (Bg, Bc)) = res
    # the kernel hard-codes the unit cotangent on geo + w_color * col;
    # scale by the actual geo cotangent (the col cotangent is g_geo *
    # w_color on the product path — assert-equivalent by construction)
    g_geo, _g_col = g
    dcol_t = tuple(d * g_geo for d in dcol)
    return (duf * g_geo, daff * g_geo, dcol_t, jnp.zeros_like(row),
            jnp.zeros_like(okf),
            jax.tree.map(jnp.zeros_like, geo_core_flat),
            (jnp.zeros_like(Bg), jnp.zeros_like(Bc)))


nicer_fused_maploss.defvjp(_nml_fwd, _nml_bwd)

# ---------------------------------------------------------------------------
# fused TRACKER iteration kernels: pose-differentiable render over the
# per-stage neighbour cache.  Unlike the mapping kernels, sample
# positions move every iteration (pts = rays_o + z*rays_d with the pose
# in rays), so the kernel computes the interpolation weights from cached
# neighbour positions IN-KERNEL and backpropagates to the rays through
# both routes (Fourier embeds and the 1/d^2 weights).  The union
# drop-then-renormalise of tracker.render_union_track reduces exactly to
# direct k-slot normalised interpolation (weights are non-negative, so
# the L1 norm over union slots equals the L1 norm over slots), which is
# what runs here.  Loss masks need batch statistics (tracker.loss_fn
# outlier rejection), so the kernel returns per-ray depth/var/color and
# the losses stay in XLA; the custom_vjp backward runs one kernel taking
# the depth/color cotangents and emitting d_rays / d_aff.
#
# Per-stage constants (pack_track_cache):
#   rowc  (n, 2S+6+3SK)  [z S | d_gt 1 | c_gt 3 | r2 1 | has S | nz 1 |
#                         cpos SK*3]
#   cfeat (n, SK*2C)     cached neighbour features [geo C | col C]/slot
# Per-iteration:
#   rays  (n, 6)         [rays_o | rays_d]   (pose-differentiable)
#   aff   (n, 12)        exposure affine rows (same row broadcast; the
#                        tracker optimises one frame's exposure)
# Reference semantics: ops/interpolate.interp_weights(diff_pos=True) +
# decoder.apply_geo/apply_color (per-sample exposure affine + sigmoid,
# decoder.py:383-390) + ops/composite.raw2outputs.


def _trackrow_offsets(S: int, K: int):
    o_z = 0
    o_dgt = S
    o_cgt = S + 1
    o_r2 = S + 4
    o_has = S + 5
    o_cp = 2 * S + 6
    return o_z, o_dgt, o_cgt, o_r2, o_has, o_cp


def _trackloss_common(n_blocks, skip, S, K, C, coef, wmode, use_affine,
                      sigmoid_plain, exact,
                      rays, rowc, cfeat, aff, Bg, Bc, gws, cws,
                      save=False):
    """Shared forward for the tracker kernel pair.  Returns a dict with
    per-ray depth/var/color, compositor internals and (save) residuals."""
    bn = rays.shape[0]
    o_z, o_dgt, o_cgt, o_r2, o_has, o_cp = _trackrow_offsets(S, K)
    r2 = rowc[:, o_r2:o_r2 + 1]
    ro = rays[:, 0:3]
    rd = rays[:, 3:6]

    pts_s, eg_parts, ec_parts = [], [], []
    wn_s, wsum_s, cg_s, cc_s = [], [], [], []
    for s in range(S):
        z_s = rowc[:, o_z + s:o_z + s + 1]
        pts = _canon(ro + z_s * rd)                          # (bn, 3)
        pts_s.append(pts)
        pg = jnp.dot(2.0 * math.pi * pts, Bg,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        eg_parts.append(jnp.sin(pg))
        pc = jnp.dot(2.0 * math.pi * pts, Bc,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        ec_parts.append(jnp.concatenate([jnp.sin(pc), jnp.cos(pc)], -1))
        # in-kernel differentiable interpolation weights
        wj_list, wsum = [], jnp.zeros((bn, 1), jnp.float32)
        for j in range(K):
            off = o_cp + (s * K + j) * 3
            cp = rowc[:, off:off + 3]
            dif = cp - pts
            dd = jnp.sum(dif * dif, axis=1, keepdims=True)
            inr = dd <= r2
            if wmode == 0:      # 'distance'
                wj = jnp.where(inr, 1.0 / (dd + 1e-10), 0.0)
            else:               # 'expo'
                wj = jnp.where(inr,
                               jnp.exp(-20.0 * jnp.sqrt(
                                   jnp.maximum(dd, 1e-12))), 0.0)
            wj_list.append(wj)
            wsum = wsum + wj
        wsafe = jnp.maximum(wsum, 1e-12)
        accg = jnp.zeros((bn, C), jnp.float32)
        accc = jnp.zeros((bn, C), jnp.float32)
        for j in range(K):
            wn = wj_list[j] / wsafe
            fo = (s * K + j) * 2 * C
            accg = accg + wn * cfeat[:, fo:fo + C].astype(jnp.float32)
            accc = accc + wn * cfeat[:, fo + C:fo + 2 * C].astype(
                jnp.float32)
        has_s = rowc[:, o_has + s:o_has + s + 1] > 0.5
        cg_s.append(_canon(jnp.where(has_s, accg, 0.0)))
        cc_s.append(_canon(jnp.where(has_s, accc, 0.0)))
        wn_s.append(wj_list)
        wsum_s.append(wsafe)

    eg = jnp.concatenate(eg_parts, 0)                        # (S*bn, Fg)
    ec = jnp.concatenate(ec_parts, 0)
    cg_all = jnp.concatenate(cg_s, 0)
    cc_all = jnp.concatenate(cc_s, 0)
    occ_out = _trunk_fwd_block(eg, cg_all, gws, n_blocks, skip, _RELU,
                               save=save, exact=exact)
    occ_all, saved_g = occ_out if save else (occ_out, None)
    rgb_out = _trunk_fwd_block(ec, cc_all, cws, n_blocks, skip,
                               _SOFTPLUS100, save=save, exact=exact)
    raw_all, saved_c = rgb_out if save else (rgb_out, None)

    # per-sample exposure affine + sigmoid (decoder.apply_color tail)
    if use_affine:
        aff_all = jnp.concatenate([aff] * S, 0)              # (S*bn, 12)
        lin = [sum(raw_all[:, c:c + 1] * aff_all[:, 3 * c + d:3 * c + d + 1]
                   for c in range(3)) + aff_all[:, 9 + d:9 + d + 1]
               for d in range(3)]
        lin_all = jnp.concatenate(lin, 1)
        rgb_all = jax.nn.sigmoid(lin_all)
    elif sigmoid_plain:
        lin_all = None
        rgb_all = jax.nn.sigmoid(raw_all)
    else:
        lin_all = None
        rgb_all = raw_all

    # occupancy compositor + depth variance (composite.raw2outputs)
    a_s, t_s, w_s = [], [], []
    t_run = jnp.ones((bn, 1), jnp.float32)
    for s in range(S):
        has_s = rowc[:, o_has + s:o_has + s + 1] > 0.5
        occ_s = jnp.where(has_s, occ_all[s * bn:(s + 1) * bn], -100.0)
        a = jax.nn.sigmoid(coef * occ_s)
        a_s.append(a)
        t_s.append(t_run)
        w_s.append(a * t_run)
        t_run = t_run * (1.0 - a + 1e-10)
    wsum = sum(w_s) + 1e-10
    depth = sum(w_s[s] * rowc[:, o_z + s:o_z + s + 1]
                for s in range(S)) / wsum
    color = sum(w_s[s] * rgb_all[s * bn:(s + 1) * bn]
                for s in range(S)) / wsum
    var = sum(w_s[s] * jnp.square(rowc[:, o_z + s:o_z + s + 1] - depth)
              for s in range(S))                             # no /wsum
    return dict(pts_s=pts_s, eg=eg, ec=ec, cg_all=cg_all, cc_all=cc_all,
                occ_all=occ_all, raw_all=raw_all, rgb_all=rgb_all,
                lin_all=lin_all, wn_s=wn_s, wsum_s=wsum_s,
                a_s=a_s, t_s=t_s, w_s=w_s, wsum=wsum,
                depth=depth, color=color, var=var,
                saved_g=saved_g, saved_c=saved_c)


def _trackloss_fwd_kernel(n_blocks, skip, S, K, C, coef, wmode,
                          use_affine, sigmoid_plain, exact,
                          rays_ref, rowc_ref, cfeat_ref, aff_ref,
                          Bg_ref, Bc_ref, *refs):
    d_ref, v_ref, c_ref = refs[-3], refs[-2], refs[-1]
    ws = [r[:] for r in refs[:-3]]
    n_geo = 4 * n_blocks + 2
    comp = _trackloss_common(
        n_blocks, skip, S, K, C, coef, wmode, use_affine, sigmoid_plain,
        exact, rays_ref[:], rowc_ref[:], cfeat_ref[:], aff_ref[:],
        Bg_ref[:], Bc_ref[:], ws[:n_geo], ws[n_geo:], save=False)
    d_ref[:] = comp["depth"]
    v_ref[:] = comp["var"]
    c_ref[:] = comp["color"]


def _trackloss_bwd_kernel(n_blocks, skip, S, K, C, coef, wmode,
                          use_affine, sigmoid_plain, exact,
                          rays_ref, rowc_ref, cfeat_ref, aff_ref,
                          Bg_ref, Bc_ref, gd_ref, gc_ref, *refs):
    drays_ref, daff_ref = refs[-2], refs[-1]
    ws = [r[:] for r in refs[:-2]]
    n_geo = 4 * n_blocks + 2
    gws, cws = ws[:n_geo], ws[n_geo:]
    rays = rays_ref[:]
    rowc = rowc_ref[:]
    cfeat = cfeat_ref[:]
    aff = aff_ref[:]
    bn = rays.shape[0]
    o_z, o_dgt, o_cgt, o_r2, o_has, o_cp = _trackrow_offsets(S, K)
    r2 = rowc[:, o_r2:o_r2 + 1]
    comp = _trackloss_common(
        n_blocks, skip, S, K, C, coef, wmode, use_affine, sigmoid_plain,
        exact, rays, rowc, cfeat, aff, Bg_ref[:], Bc_ref[:],
        gws, cws, save=True)
    g_depth = gd_ref[:]                                      # (bn, 1)
    g_color = gc_ref[:]                                      # (bn, 3)
    depth, color, wsum = comp["depth"], comp["color"], comp["wsum"]
    a_s, t_s, w_s = comp["a_s"], comp["t_s"], comp["w_s"]
    rgb_all = comp["rgb_all"]

    # compositor backward (depth + color; var has stopped gradients)
    dw_s = []
    for s in range(S):
        z_s = rowc[:, o_z + s:o_z + s + 1]
        rgb_s = rgb_all[s * bn:(s + 1) * bn]
        dcol_term = jnp.sum(g_color * (rgb_s - color), 1, keepdims=True)
        dw_s.append((g_depth * (z_s - depth) + dcol_term) / wsum)
    suffix = jnp.zeros((bn, 1), jnp.float32)
    da_s = [None] * S
    for s in range(S - 1, -1, -1):
        da_s[s] = dw_s[s] * t_s[s] - suffix / (1.0 - a_s[s] + 1e-10)
        suffix = suffix + dw_s[s] * w_s[s]
    docc_s, drgb_s = [], []
    for s in range(S):
        has_s = rowc[:, o_has + s:o_has + s + 1] > 0.5
        docc = da_s[s] * coef * a_s[s] * (1.0 - a_s[s])
        docc_s.append(_canon(jnp.where(has_s, docc, 0.0)))
        drgb_s.append(_canon(g_color * (w_s[s] / wsum)))
    g_occ = jnp.concatenate(docc_s, 0)
    g_rgb = jnp.concatenate(drgb_s, 0)                       # (S*bn, 3)

    # rgb tail backward -> d_raw (+ d_aff)
    if use_affine:
        sg = rgb_all
        g_lin = g_rgb * sg * (1.0 - sg)                      # (S*bn, 3)
        raw_all = comp["raw_all"]
        g_raw_cols = []
        for c in range(3):
            acc = jnp.zeros((S * bn, 1), jnp.float32)
            for d in range(3):
                acc = acc + g_lin[:, d:d + 1] \
                    * jnp.concatenate([aff[:, 3 * c + d:3 * c + d + 1]] * S,
                                      0)
            g_raw_cols.append(acc)
        g_raw = jnp.concatenate(g_raw_cols, 1)
        # d_aff accumulated over samples, back in per-ray rows
        daff_cols = []
        for c in range(3):
            for d in range(3):
                acc = jnp.zeros((bn, 1), jnp.float32)
                for s in range(S):
                    acc = acc + (g_lin[s * bn:(s + 1) * bn, d:d + 1]
                                 * raw_all[s * bn:(s + 1) * bn, c:c + 1])
                daff_cols.append(acc)
        for d in range(3):
            acc = jnp.zeros((bn, 1), jnp.float32)
            for s in range(S):
                acc = acc + g_lin[s * bn:(s + 1) * bn, d:d + 1]
            daff_cols.append(acc)
        daff_ref[:] = jnp.concatenate(daff_cols, 1)
    elif sigmoid_plain:
        sg = rgb_all
        g_raw = g_rgb * sg * (1.0 - sg)
        daff_ref[:] = jnp.zeros_like(daff_ref)
    else:
        g_raw = g_rgb
        daff_ref[:] = jnp.zeros_like(daff_ref)

    d_eg, d_cg, _ = _trunk_bwd_block(g_occ, comp["eg"], comp["cg_all"],
                                     gws, comp["saved_g"], n_blocks, skip,
                                     _RELU, exact=exact)
    d_ec, d_cc, _ = _trunk_bwd_block(g_raw, comp["ec"], comp["cc_all"],
                                     cws, comp["saved_c"], n_blocks, skip,
                                     _SOFTPLUS100, exact=exact)

    # position cotangents: embeds route + weights route, per slice
    Fg = comp["eg"].shape[1]
    Fc2 = comp["ec"].shape[1]
    Fc = Fc2 // 2
    dro = jnp.zeros((bn, 3), jnp.float32)
    drd = jnp.zeros((bn, 3), jnp.float32)
    for s in range(S):
        pts = comp["pts_s"][s]
        z_s = rowc[:, o_z + s:o_z + s + 1]
        has_s = rowc[:, o_has + s:o_has + s + 1] > 0.5
        # embeds: eg = sin(2pi pts Bg); ec = [sin, cos](2pi pts Bc)
        pg = jnp.dot(2.0 * math.pi * pts, Bg_ref[:],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        pc = jnp.dot(2.0 * math.pi * pts, Bc_ref[:],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        d_eg_s = d_eg[s * bn:(s + 1) * bn]
        d_ec_s = d_ec[s * bn:(s + 1) * bn]
        d_pg = d_eg_s * jnp.cos(pg)
        d_pc = (d_ec_s[:, :Fc] * jnp.cos(pc)
                - d_ec_s[:, Fc:] * jnp.sin(pc))
        d_pts = (jnp.dot(d_pg, (2.0 * math.pi) * Bg_ref[:].T,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(d_pc, (2.0 * math.pi) * Bc_ref[:].T,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32))
        # weights route: dacc -> d_wn -> d_w -> d_dd -> d_pts
        dg_s = jnp.where(has_s, d_cg[s * bn:(s + 1) * bn], 0.0)
        dc_s = jnp.where(has_s, d_cc[s * bn:(s + 1) * bn], 0.0)
        wsafe = comp["wsum_s"][s]
        wj_list = comp["wn_s"][s]
        # d_wn_j = <dg, feat_g> + <dc, feat_c>;  wn_j = w_j / wsafe
        dwn = []
        for j in range(K):
            fo = (s * K + j) * 2 * C
            t1 = jnp.sum(dg_s * cfeat[:, fo:fo + C].astype(jnp.float32),
                         1, keepdims=True)
            t2 = jnp.sum(dc_s * cfeat[:, fo + C:fo + 2 * C].astype(
                jnp.float32), 1, keepdims=True)
            dwn.append(t1 + t2)
        # quotient rule through wn = w / wsafe
        inner = jnp.zeros((bn, 1), jnp.float32)
        for j in range(K):
            inner = inner + dwn[j] * wj_list[j]
        inner = inner / (wsafe * wsafe)
        for j in range(K):
            off = o_cp + (s * K + j) * 3
            cp = rowc[:, off:off + 3]
            dif = cp - pts
            dd = jnp.sum(dif * dif, axis=1, keepdims=True)
            inr = dd <= r2
            dw_j = dwn[j] / wsafe - inner
            if wmode == 0:
                ddd = -dw_j * wj_list[j] * wj_list[j]
            else:
                sq = jnp.sqrt(jnp.maximum(dd, 1e-12))
                ddd = dw_j * wj_list[j] * (-10.0 / sq)
            ddd = jnp.where(inr, ddd, 0.0)
            d_pts = d_pts + ddd * 2.0 * (pts - cp)
        dro = dro + d_pts
        drd = drd + z_s * d_pts
    drays_ref[:] = jnp.concatenate([dro, drd], 1)


def _trackloss_specs(Dr, K, S, C, bn, Bg, Bc, w2):
    def rrow(width):
        return pl.BlockSpec((bn, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [rrow(6), rrow(Dr), rrow(S * K * 2 * C), rrow(12),
                full_spec(Bg), full_spec(Bc)] \
        + [full_spec(w) for w in w2]
    return rrow, full_spec, in_specs


def _track_bn(n_r: int, S: int, bwd: bool) -> int:
    cap = max(8, (512 if bwd else 1024) // S)
    cap = (cap // 8) * 8
    return min(cap, -(-n_r // 8) * 8)


@functools.partial(jax.jit, static_argnames=(
    "n_blocks", "skip", "S", "K", "C", "coef", "wmode", "use_affine",
    "sigmoid_plain", "exact"))
def _trackloss_fwd(rays, rowc, cfeat, aff, Bg, Bc, geo_flat, col_flat,
                   n_blocks: int, skip: int, S: int, K: int, C: int,
                   coef: float, wmode: int, use_affine: bool,
                   sigmoid_plain: bool, exact: bool = False):
    n_r = rays.shape[0]
    bn = _track_bn(n_r, S, bwd=False)
    nr_pad = -(-n_r // bn) * bn
    raysp = _pad_rows(rays, nr_pad)
    rowp = _pad_rows(rowc, nr_pad)
    featp = _pad_rows(cfeat, nr_pad)
    affp = _pad_rows(aff, nr_pad)
    grid = (nr_pad // bn,)
    w_all = list(geo_flat) + list(col_flat)
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    rrow, full_spec, in_specs = _trackloss_specs(
        rowc.shape[1], K, S, C, bn, Bg, Bc, w2)
    kern = functools.partial(_trackloss_fwd_kernel, n_blocks, skip, S, K,
                             C, coef, wmode, use_affine, sigmoid_plain,
                             exact)
    d, v, c = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=[rrow(1), rrow(1), rrow(3)],
        out_shape=[jax.ShapeDtypeStruct((nr_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nr_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nr_pad, 3), jnp.float32)],
        interpret=_interpret(),
    )(raysp, rowp, featp, affp, Bg, Bc, *w2)
    return d[:n_r, 0], v[:n_r, 0], c[:n_r]


@functools.partial(jax.jit, static_argnames=(
    "n_blocks", "skip", "S", "K", "C", "coef", "wmode", "use_affine",
    "sigmoid_plain", "exact"))
def _trackloss_bwd_call(rays, rowc, cfeat, aff, Bg, Bc, geo_flat,
                        col_flat, g_depth, g_color,
                        n_blocks: int, skip: int, S: int, K: int, C: int,
                        coef: float, wmode: int, use_affine: bool,
                        sigmoid_plain: bool, exact: bool = False):
    n_r = rays.shape[0]
    bn = _track_bn(n_r, S, bwd=True)
    nr_pad = -(-n_r // bn) * bn
    raysp = _pad_rows(rays, nr_pad)
    rowp = _pad_rows(rowc, nr_pad)
    featp = _pad_rows(cfeat, nr_pad)
    affp = _pad_rows(aff, nr_pad)
    gdp = _pad_rows(g_depth[:, None], nr_pad)
    gcp = _pad_rows(g_color, nr_pad)
    grid = (nr_pad // bn,)
    w_all = list(geo_flat) + list(col_flat)
    w2 = [w if w.ndim == 2 else w.reshape(1, -1) for w in w_all]
    rrow, full_spec, in_specs = _trackloss_specs(
        rowc.shape[1], K, S, C, bn, Bg, Bc, w2)
    in_specs = in_specs[:6] + [rrow(1), rrow(3)] + in_specs[6:]
    kern = functools.partial(_trackloss_bwd_kernel, n_blocks, skip, S, K,
                             C, coef, wmode, use_affine, sigmoid_plain,
                             exact)
    drays, daff = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=[rrow(6), rrow(12)],
        out_shape=[jax.ShapeDtypeStruct((nr_pad, 6), jnp.float32),
                   jax.ShapeDtypeStruct((nr_pad, 12), jnp.float32)],
        interpret=_interpret(),
    )(raysp, rowp, featp, affp, Bg, Bc, gdp, gcp, *w2)
    return drays[:n_r], daff[:n_r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12,
                                                    13, 14, 15))
def nicer_fused_trackloss(rays, aff, rowc, cfeat, geo_flat, col_flat, Bs,
                          n_blocks: int, skip: int, S: int, K: int,
                          C: int, coef: float, wmode: int,
                          use_affine: bool, sigmoid_plain: bool = False):
    """Fused tracker render: (depth (n,), var (n,), color (n, 3)).

    Differentiable in ``rays`` (n, 6 = [o|d]) and ``aff`` (n, 12); the
    per-stage cache rows, neighbour features, decoder weights and Fourier
    Bs are constants (features are frozen during tracking).  ``var``
    carries no gradient (tracker stop-gradients uncertainty).
    Semantics: interpolate.interp_weights(diff_pos=True) + NICER trunks +
    per-sample exposure affine (decoder.py:383-390) + raw2outputs."""
    Bg, Bc = Bs
    return _trackloss_fwd(rays, rowc, cfeat, aff, Bg, Bc,
                          tuple(geo_flat), tuple(col_flat),
                          n_blocks, skip, S, K, C, coef, wmode,
                          use_affine, sigmoid_plain)


def _ntl_fwd(rays, aff, rowc, cfeat, geo_flat, col_flat, Bs,
             n_blocks, skip, S, K, C, coef, wmode, use_affine,
             sigmoid_plain=False):
    out = nicer_fused_trackloss(rays, aff, rowc, cfeat, geo_flat,
                                col_flat, Bs, n_blocks, skip, S, K, C,
                                coef, wmode, use_affine, sigmoid_plain)
    return out, (rays, aff, rowc, cfeat, geo_flat, col_flat, Bs)


def _ntl_bwd(n_blocks, skip, S, K, C, coef, wmode, use_affine,
             sigmoid_plain, res, g):
    (rays, aff, rowc, cfeat, geo_flat, col_flat, (Bg, Bc)) = res
    g_depth, _g_var, g_color = g
    drays, daff = _trackloss_bwd_call(
        rays, rowc, cfeat, aff, Bg, Bc, tuple(geo_flat),
        tuple(col_flat), g_depth, g_color,
        n_blocks, skip, S, K, C, coef, wmode, use_affine, sigmoid_plain)
    return (drays, daff, jnp.zeros_like(rowc), jnp.zeros_like(cfeat),
            jax.tree.map(jnp.zeros_like, geo_flat),
            jax.tree.map(jnp.zeros_like, col_flat),
            (jnp.zeros_like(Bg), jnp.zeros_like(Bc)))


nicer_fused_trackloss.defvjp(_ntl_fwd, _ntl_bwd)
