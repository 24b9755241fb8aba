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

Measured next levers (round-3 traces, one TPU v5e chip, ScanNet op
point, ~4.6 ms/iteration):
  * ~1.1 ms/iter of inter-op scheduling latency remains — the next
    structural win is folding the per-ray compositor + losses (and their
    backward) into these kernels so one fwd + one bwd kernel cover the
    whole iteration except gather/scatter/Adam.  A full mega-kernel
    (feature table resident in VMEM) is blocked: Mosaic has no
    vectorized int-array indexing ("Cannot do int indexing on TPU").
  * the backward's in-kernel forward recompute costs ~0.4 ms; saving
    bf16 pre-activations from the forward trades ~0.2 ms of HBM for it
    (net ~+0.2 ms/iter — marginal, unimplemented).
  * the union-cache scatter-add (0.75 ms, 80k rows) is row-serial on
    TPU; no cheaper formulation found (sort+cumsum costs more).

Gradients produced: d(positions), d(c_geo), d(c_col), d(colour core
weights).  The geometry core and both Fourier B matrices are treated as
frozen (reference default: geometry decoders are never optimized,
point_slam.yaml:69-71; the learnable geo embedding only moves when the
geo decoder is unfrozen) — callers must fall back to the unfused path
when optimizing them (models/decoder.py eval_stage gates on
``cfg.fused_mlp and not opt_geo_dec``).
"""
from __future__ import annotations

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

def _pick_bn_rays(n_rays: int, S: int) -> int:
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
