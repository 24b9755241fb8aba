"""NICER decoder family — functional JAX re-design.

Reference: src/conv_onet/models/decoder.py (757 LoC of nn.Module classes).
Here each decoder is a params pytree + a pure ``apply`` function, so the
whole render step jits into one XLA program and the mapper/tracker can take
gradients w.r.t. any subset (features, decoder params, poses) for free.

Architecture parity (decoder.py:108-342, 399-618, 621-758):

* geometry MLP: width 32, 5 blocks, skip concat after block 2, learnable
  Gaussian-Fourier embedding (93 freqs, scale 25, sin-only), per-block
  additive feature injection ``h += fc_c[i](c)``, scalar occupancy logit,
  ReLU hidden activations.
* colour MLP: width 128, fixed Gaussian-Fourier embedding (20 freqs, scale
  32, sin+cos -> 40-d), optional view-direction embedding, optional
  relative-position encoding of neighbours (learnable 10-freq Fourier +
  2-layer MLP), optional exposure MLP (8-d latent -> 3x3 affine + bias),
  Softplus(beta=100) hidden activations, sigmoid output (deferred when the
  caller applies exposure per-frame, mapper path).
* two levels ('mid', 'fine') x (geometry, colour) = 4 decoders.

kNN + inverse-distance interpolation are factored out (ops/knn,
ops/interpolate) and computed once per stage — the reference recomputes the
same search once per decoder (decoder.py:201, 497).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import interpolate as IT

Params = Dict[str, Any]


def _resolve_fused(v) -> bool:
    """'auto' -> fused trunks on TPU, XLA path elsewhere (the Pallas
    kernels run in interpret mode off-TPU — correct but slow, fine for
    tests, wrong default for CPU runs)."""
    if v == "auto":
        d = jax.devices()[0]
        return "tpu" in (d.platform + " " + d.device_kind).lower()
    return bool(v)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static decoder configuration (hashable; safe as a jit static arg).

    Field defaults mirror configs/point_slam.yaml + ScanNet overrides.
    """
    c_dim: int = 32
    hidden_geo: int = 32
    hidden_col: int = 128
    n_blocks: int = 5
    skip: int = 2
    geo_embed: int = 93
    geo_scale: float = 25.0
    col_embed: int = 20
    col_scale: float = 32.0
    rel_embed: int = 10
    rel_scale: float = 32.0
    exposure_dim: int = 8
    min_nn_num: int = 2
    nn_num: int = 8
    N_surface: int = 5
    weighting: str = "distance"
    encode_rel_pos_in_col: bool = False
    encode_rel_pos_in_geo: bool = False
    encode_exposure: bool = False
    encode_viewd: bool = False
    use_view_direction: bool = False
    use_normals: bool = False
    # bf16 MLP trunks: hidden activations + weights cast to bfloat16 with
    # f32 accumulation (MXU-native).  Measured SLOWER than f32 at the
    # mapping operating point (the iteration is HLO-op-count bound, not
    # bandwidth bound) — kept as a knob, off by default.
    mm_bf16: bool = False
    # Pallas-fused decoder trunks (ops/fused_mlp): one kernel per trunk
    # pass instead of ~1000 small XLA ops; weights + activations stay in
    # VMEM.  Only valid while the geometry core / Fourier Bs are frozen
    # (reference default) and no rel-pos/normals/view-direction encoding
    # is active — eval_stage falls back to the XLA path otherwise.
    fused_mlp: bool = False
    # Whole-iteration fused mapping objective on the union path
    # (ops/fused_mlp.nicer_fused_maploss): trunks + occupancy compositor
    # + exposure affine + masked L1 losses + all cotangents in ONE
    # combined Pallas kernel per iteration (slice-major sample stacks
    # built in-kernel from the packed cache row; no cross-boundary
    # relayouts).  Measured on TPU v5e at the ScanNet operating point:
    # colour 4.18 -> 3.89 ms/iter, geometry 3.30 -> 2.65 vs fused trunks
    # alone.  Requires fused_mlp; renderer-path calls (tracker/eval)
    # ignore it.
    fused_composite: bool = False

    @classmethod
    def from_cfg(cls, cfg: dict) -> "ModelConfig":
        m = cfg["model"]
        pc = cfg["pointcloud"]
        return cls(
            c_dim=m["c_dim"],
            mm_bf16=m.get("mm_bf16", False),
            fused_mlp=_resolve_fused(m.get("fused_mlp", "auto")),
            fused_composite=_resolve_fused(
                m.get("fused_composite", "auto")),
            exposure_dim=m["exposure_dim"],
            min_nn_num=pc["min_nn_num"],
            nn_num=pc["nn_num"],
            N_surface=cfg["rendering"]["N_surface"],
            weighting=pc["nn_weighting"],
            encode_rel_pos_in_col=m["encode_rel_pos_in_col"],
            encode_rel_pos_in_geo=m.get("encode_rel_pos_in_geo", False),
            encode_exposure=m["encode_exposure"],
            encode_viewd=m.get("encode_viewd", False),
            use_view_direction=cfg.get("use_view_direction", False),
            use_normals=cfg.get("use_normals", False),
        )


# ---------------------------------------------------------------------------
# initialisers (torch-compatible distributions)

def _linear_default(key, fan_in, fan_out):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _dense(key, fan_in, fan_out, gain_mode="relu"):
    """Xavier-uniform with activation gain, zero bias (DenseLayer,
    decoder.py:86-95)."""
    gain = math.sqrt(2.0) if gain_mode == "relu" else 1.0
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(key, (fan_in, fan_out), minval=-bound, maxval=bound)
    return {"w": w, "b": jnp.zeros((fan_out,))}


def _xavier(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    bb = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), minval=-bb, maxval=bb)
    return {"w": w, "b": b}


def _normal001(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (fan_in, fan_out)) * 0.01
    bb = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), minval=-bb, maxval=bb)
    return {"w": w, "b": b}


def _apply_linear(p, x, precision=None):
    return jnp.matmul(x, p["w"], precision=precision) + p["b"]


def softplus100(x):
    """Softplus with beta=100 (torch.nn.Softplus(beta=100), decoder.py:189).

    beta*x is clamped like torch does (threshold 20) for stability.
    """
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0))) / 100.0)


# ---------------------------------------------------------------------------
# Fourier feature embeddings (decoder.py:14-45)

def fourier_features(x, B, concat_cos: bool):
    """sin(2*pi*x @ B) (optionally also cos).  x: (N, d), B: (d, m)."""
    proj = jnp.matmul(2.0 * math.pi * x, B,
                      precision=jax.lax.Precision.HIGHEST)
    if concat_cos:
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    return jnp.sin(proj)


# ---------------------------------------------------------------------------
# parameter construction

def init_mlp_core(key, cfg: ModelConfig, hidden: int, embed_in: int,
                  out_dim: int, out_gain: str):
    """Shared trunk: pts_linears + fc_c + output."""
    keys = jax.random.split(key, 2 * cfg.n_blocks + 1)
    # layer i input dims: i == 0: embed_in; i == skip+1: hidden+embed_in
    # (skip concat happens after block `skip`); else hidden
    layers = []
    for i in range(cfg.n_blocks):
        if i == 0:
            in_dim = embed_in
        elif i == cfg.skip + 1:
            in_dim = hidden + embed_in
        else:
            in_dim = hidden
        layers.append(_dense(keys[i], in_dim, hidden, "relu"))
    fc_c = [
        _linear_default(keys[cfg.n_blocks + i], cfg.c_dim, hidden)
        for i in range(cfg.n_blocks)
    ]
    out = _dense(keys[-1], hidden, out_dim, out_gain)
    return {"layers": layers, "fc_c": fc_c, "out": out}


def init_geo_decoder(key, cfg: ModelConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "B": jax.random.normal(k1, (3, cfg.geo_embed)) * cfg.geo_scale,  # learnable
        "core": init_mlp_core(k2, cfg, cfg.hidden_geo, cfg.geo_embed, 1, "relu"),
    }
    if cfg.encode_rel_pos_in_geo:
        p["rel_B"] = jax.random.normal(k3, (3, cfg.rel_embed)) * cfg.rel_scale
        p["mlp_neighbor"] = {
            "l1": _xavier(jax.random.fold_in(k4, 0),
                          cfg.c_dim + 2 * cfg.rel_embed, cfg.hidden_col),
            "l2": _xavier(jax.random.fold_in(k4, 1), cfg.hidden_col, cfg.c_dim),
        }
    return p


def init_color_decoder(key, cfg: ModelConfig) -> Params:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    embed_in = 2 * cfg.col_embed
    if cfg.use_view_direction:
        embed_in += 2 * cfg.col_embed if cfg.encode_viewd else 3
    p = {
        "B": jax.random.normal(k1, (3, cfg.col_embed)) * cfg.col_scale,  # fixed
        "core": init_mlp_core(k2, cfg, cfg.hidden_col, embed_in, 3, "linear"),
        "rel_B": jax.random.normal(k3, (3, cfg.rel_embed)) * cfg.rel_scale,
        "mlp_neighbor": {
            "l1": _xavier(jax.random.fold_in(k4, 0),
                          cfg.c_dim + 2 * cfg.rel_embed, cfg.hidden_col),
            "l2": _xavier(jax.random.fold_in(k4, 1), cfg.hidden_col, cfg.c_dim),
        },
    }
    if cfg.use_view_direction and cfg.encode_viewd:
        p["view_B"] = jax.random.normal(k5, (3, cfg.col_embed)) * cfg.col_scale
    if cfg.use_normals:
        p["normal_B"] = jax.random.normal(k5, (2, cfg.col_embed)) * cfg.col_scale
    if cfg.encode_exposure:
        p["exposure"] = {
            "l1": _normal001(jax.random.fold_in(k6, 0), cfg.exposure_dim,
                             cfg.hidden_col),
            "l2": _normal001(jax.random.fold_in(k6, 1), cfg.hidden_col, 12),
        }
    return p


def init_nicer(key, cfg: ModelConfig) -> Params:
    """All four decoders (NICER.__init__, decoder.py:637-658)."""
    kg1, kg2, kc1, kc2 = jax.random.split(key, 4)
    return {
        "geo_mid": init_geo_decoder(kg1, cfg),
        "geo_fine": init_geo_decoder(kg2, cfg),
        "col_mid": init_color_decoder(kc1, cfg),
        "col_fine": init_color_decoder(kc2, cfg),
    }


# ---------------------------------------------------------------------------
# forward passes

def _apply_linear_bf16(p, x):
    """x @ w + b with bf16 operands and f32 accumulation (one MXU pass)."""
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), p["w"].astype(jnp.bfloat16),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y + p["b"]


def _mlp_trunk(core: Params, cfg: ModelConfig, embedded, c, actvn):
    """Shared trunk with skip concat + additive feature injection
    (decoder.py:328-338).

    mm_bf16 mode keeps the inter-layer activations in bfloat16 (the matmuls
    accumulate f32, the activation function runs f32, then the result is
    stored bf16) — halves the activation HBM traffic of forward AND of the
    rematerialising backward.
    """
    if not cfg.mm_bf16:
        h = embedded
        for i, layer in enumerate(core["layers"]):
            h = _apply_linear(layer, h)
            h = actvn(h)
            h = h + _apply_linear(core["fc_c"][i], c)
            if i == cfg.skip:
                h = jnp.concatenate([embedded, h], axis=-1)
        return _apply_linear(core["out"], h)

    emb16 = embedded.astype(jnp.bfloat16)
    c16 = c.astype(jnp.bfloat16)
    h = emb16
    for i, layer in enumerate(core["layers"]):
        h = _apply_linear_bf16(layer, h)
        h = actvn(h)
        h = (h + _apply_linear_bf16(core["fc_c"][i], c16)).astype(jnp.bfloat16)
        if i == cfg.skip:
            h = jnp.concatenate([emb16, h], axis=-1)
    return _apply_linear_bf16(core["out"], h)


def _neighbor_transform(p_dec: Params, cfg: ModelConfig, neighbor_feats,
                        neighbor_rel_pos):
    """Relative-position encoding of neighbour features
    (decoder.py:537-545 + MLP_col_neighbor 361-377)."""
    Q, k, _ = neighbor_feats.shape
    emb = fourier_features(neighbor_rel_pos.reshape(-1, 3), p_dec["rel_B"],
                           concat_cos=True).reshape(Q, k, 2 * cfg.rel_embed)
    x = jnp.concatenate([emb, neighbor_feats], axis=-1)
    mlpn = p_dec["mlp_neighbor"]
    x = softplus100(_apply_linear(mlpn["l1"], x))
    return _apply_linear(mlpn["l2"], x)


def interpolate_level_feats(p_dec: Params, cfg: ModelConfig, p, D, I, feats,
                            cloud_pos, r_query, diff_pos: bool,
                            encode_rel_pos: bool):
    """kNN feature interpolation for one decoder at sample positions p.

    Combines ops.interpolate with the optional per-decoder neighbour MLP.
    Returns (c [Q, c_dim], has_neighbors [Q]).
    """
    weights, has = IT.interp_weights(
        D, I, p, cloud_pos, r_query, cfg.min_nn_num, cfg.weighting, diff_pos)
    if encode_rel_pos:
        nf = feats[I]
        rel = cloud_pos[I] - p[:, None, :]
        nf = _neighbor_transform(p_dec, cfg, nf, rel)
        c = jnp.sum(weights * nf, axis=1)
        c = jnp.where(has[:, None], c, jnp.zeros_like(c))
    else:
        c = IT.weighted_gather(feats, I, weights, has)
    return c, has


def apply_geo(p_dec: Params, cfg: ModelConfig, p, c):
    """Occupancy logit (N,) from positions + interpolated features.

    Geometry trunk uses ReLU activations (decoder.py:331 F.relu).
    """
    emb = fourier_features(p, p_dec["B"], concat_cos=False)
    out = _mlp_trunk(p_dec["core"], cfg, emb, c, jax.nn.relu)
    return out[..., 0]


def exposure_affine(p_dec: Params, exposure_feat):
    """8-d latent -> (3x3 rot, 3 trans) colour affine (decoder.py:380-396,
    606-611)."""
    e = p_dec["exposure"]
    h = softplus100(_apply_linear(e["l1"], exposure_feat))
    aff = _apply_linear(e["l2"], h)
    return aff[..., :9].reshape(3, 3), aff[..., 9:]


def apply_color(p_dec: Params, cfg: ModelConfig, p, c,
                views_d: Optional[jnp.ndarray] = None,
                normals: Optional[jnp.ndarray] = None,
                exposure_feat: Optional[jnp.ndarray] = None):
    """RGB (N, 3).  Sigmoid unless exposure is deferred to the caller
    (mapper applies per-frame affines, Mapper.py:802-856).

    Colour trunk uses Softplus(beta=100) activations (decoder.py:484, 597).
    """
    emb = fourier_features(p, p_dec["B"], concat_cos=True)
    if cfg.use_normals and normals is not None:
        emb = jnp.concatenate(
            [emb, fourier_features(normals, p_dec["normal_B"], True)], -1)
    elif cfg.use_view_direction and views_d is not None:
        v = views_d / jnp.maximum(
            jnp.linalg.norm(views_d, axis=-1, keepdims=True), 1e-12)
        if cfg.encode_viewd:
            v = fourier_features(v, p_dec["view_B"], True)
        emb = jnp.concatenate([emb, v], -1)
    out = _mlp_trunk(p_dec["core"], cfg, emb, c, softplus100)
    if cfg.encode_exposure:
        if exposure_feat is not None:
            rot, trans = exposure_affine(p_dec, exposure_feat)
            out = jnp.matmul(out, rot) + trans
            out = jax.nn.sigmoid(out)
        # else: raw output; caller applies exposure + sigmoid per frame
    else:
        out = jax.nn.sigmoid(out)
    return out


def valid_ray_mask(has_neighbors, n_pts_per_ray: int, n_surface: int):
    """Ray valid iff >= N_surface//2+1 of its samples have neighbours
    (decoder.py:310-311)."""
    per_ray = jnp.sum(has_neighbors.reshape(-1, n_pts_per_ray), axis=1)
    return per_ray >= int(n_surface / 2 + 1)


def fused_usable(cfg: ModelConfig, views_d=None, normals=None) -> bool:
    """Whether the Pallas-fused trunk path applies (see ModelConfig)."""
    return (cfg.fused_mlp and not cfg.encode_rel_pos_in_geo
            and not cfg.encode_rel_pos_in_col
            and not cfg.use_view_direction and not cfg.use_normals
            and views_d is None and normals is None)


def fused_geo(p_dec: Params, cfg: ModelConfig, p, c_geo,
              need_dp: bool = True):
    """apply_geo via the Pallas-fused kernel (geometry core frozen).

    need_dp=False skips the embedding backward when the sample positions
    are constants (mapper union path)."""
    from ..ops import fused_mlp as FM
    return FM.nicer_fused_geo(p, c_geo,
                              tuple(FM.flatten_core(p_dec["core"])),
                              p_dec["B"], cfg.n_blocks, cfg.skip,
                              False, need_dp)


def fused_color_pair(geo_dec: Params, col_dec: Params, cfg: ModelConfig,
                     p, c_geo, c_col, exposure_feat=None,
                     need_dp: bool = True, need_wgrads: bool = True):
    """apply_geo + apply_color in one Pallas kernel pair.

    Returns (occ (n,), rgb (n, 3)); the exposure/sigmoid tail matches
    apply_color (raw output when exposure is deferred to the caller).
    need_dp=False skips the embedding backward when sample positions are
    constants (mapper union path)."""
    from ..ops import fused_mlp as FM
    occ, out = FM.nicer_fused_color(
        p, c_geo, c_col,
        tuple(FM.flatten_core(geo_dec["core"])),
        tuple(FM.flatten_core(col_dec["core"])),
        (geo_dec["B"], col_dec["B"]), cfg.n_blocks, cfg.skip, False,
        need_dp, need_wgrads)
    if cfg.encode_exposure:
        if exposure_feat is not None:
            rot, trans = exposure_affine(col_dec, exposure_feat)
            out = jnp.matmul(out, rot) + trans
            out = jax.nn.sigmoid(out)
    else:
        out = jax.nn.sigmoid(out)
    return occ, out


def eval_stage(params: Params, cfg: ModelConfig, stage: str, p, D, I,
               geo_feats, col_feats, cloud_pos, r_query,
               n_pts_per_ray: int, is_tracker: bool = False,
               views_d=None, normals=None, exposure_feat=None,
               cat_feats=None, dec_wgrads: bool = True,
               dense_cache=None):
    """Evaluate one render stage at sample positions.

    Mirrors ``NICER.forward`` (decoder.py:660-758) with ``stage`` static:
      'geometry_mid'|'geometry_fine' -> raw (N,4) with rgb=0
      'color_mid'|'color_fine'       -> rgb + occupancy
      'color_all'                    -> fine colour + (mid+fine) occupancy
                                        (requires caller to pass dict feats;
                                        handled in renderer)
    The kNN result (D, I) is computed once by the caller and shared by the
    geometry and colour decoders of the level (the reference searches twice).

    dense_cache: optional (cpos (Q, k, 3), cfeat (Q, k, 2C)) PRE-GATHERED
    frozen neighbour positions + [geo | col] features (tracker sub-stage
    hoisting; invalid slots carry a 1e6 sentinel position / zero features).
    Requires is_tracker and the plain (non-rel-pos) feature variant; the
    per-call row gathers disappear.

    Returns: raw (N, 4), valid_ray (N_rays,), point_mask (N,)
    """
    level = "mid" if stage.endswith("_mid") else "fine"
    geo_dec = params[f"geo_{level}"]
    if dense_cache is not None:
        assert is_tracker and not (cfg.encode_rel_pos_in_geo
                                   or cfg.encode_rel_pos_in_col), \
            "dense_cache: tracker-mode plain feature variant only"
        cpos, cfeat = dense_cache

    if stage.startswith("geometry"):
        if dense_cache is not None:
            weights, has = IT.interp_weights(
                D, I, p, cloud_pos, r_query, cfg.min_nn_num, cfg.weighting,
                diff_pos=True, neighbor_pos=cpos)
            c_geo = IT.weighted_dense(cfeat[..., : cfg.c_dim], weights, has)
        else:
            c_geo, has = interpolate_level_feats(
                geo_dec, cfg, p, D, I, geo_feats, cloud_pos, r_query,
                diff_pos=is_tracker, encode_rel_pos=cfg.encode_rel_pos_in_geo)
        if fused_usable(cfg):
            occ = fused_geo(geo_dec, cfg, p, c_geo)
        else:
            occ = apply_geo(geo_dec, cfg, p, c_geo)
        vmask = valid_ray_mask(has, n_pts_per_ray, cfg.N_surface)
        raw = jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1)
        return raw, vmask, has

    col_dec = params[f"col_{level}"]
    if dense_cache is not None:
        weights, has = IT.interp_weights(
            D, I, p, cloud_pos, r_query, cfg.min_nn_num, cfg.weighting,
            diff_pos=True, neighbor_pos=cpos)
        c_all = IT.weighted_dense(cfeat, weights, has).astype(jnp.float32)
        c_geo, c_col = c_all[:, : cfg.c_dim], c_all[:, cfg.c_dim:]
    elif not (cfg.encode_rel_pos_in_geo or cfg.encode_rel_pos_in_col):
        # single fused gather of [geo | col] features — random-access
        # gathers are the mapping bottleneck on TPU (one 2C-wide gather
        # beats two C-wide ones; the concat is cheap sequential bandwidth).
        # Callers with read-only features (tracker) pass a hoisted,
        # optionally bf16-cast ``cat_feats`` so the concat/cast isn't
        # rebuilt inside their optimization scan.
        weights, has = IT.interp_weights(
            D, I, p, cloud_pos, r_query, cfg.min_nn_num, cfg.weighting,
            is_tracker)
        cat = (cat_feats if cat_feats is not None
               else jnp.concatenate([geo_feats, col_feats], axis=1))
        c_all = IT.weighted_gather(cat, I, weights, has)
        c_all = c_all.astype(jnp.float32)
        c_geo, c_col = c_all[:, : cfg.c_dim], c_all[:, cfg.c_dim:]
    else:
        c_geo, has = interpolate_level_feats(
            geo_dec, cfg, p, D, I, geo_feats, cloud_pos, r_query,
            diff_pos=is_tracker, encode_rel_pos=cfg.encode_rel_pos_in_geo)
        c_col, _ = interpolate_level_feats(
            col_dec, cfg, p, D, I, col_feats, cloud_pos, r_query,
            diff_pos=is_tracker, encode_rel_pos=cfg.encode_rel_pos_in_col)
    vmask = valid_ray_mask(has, n_pts_per_ray, cfg.N_surface)
    if fused_usable(cfg, views_d, normals):
        # dec_wgrads=False (tracker: only pose + the exposure MLP, which
        # sits outside the trunk, are optimized) skips the 22 weight-grad
        # kernel outputs.  NOTE: keyed on the caller's explicit flag, NOT
        # on is_tracker — the mapper's BA path also uses tracker-mode
        # (pose-differentiable) weights while genuinely optimizing the
        # colour decoder.
        occ, rgb = fused_color_pair(geo_dec, col_dec, cfg, p, c_geo, c_col,
                                    exposure_feat=exposure_feat,
                                    need_wgrads=dec_wgrads)
    else:
        occ = apply_geo(geo_dec, cfg, p, c_geo)
        rgb = apply_color(col_dec, cfg, p, c_col, views_d=views_d,
                          normals=normals, exposure_feat=exposure_feat)
    raw = jnp.concatenate([rgb, occ[..., None]], axis=-1)
    return raw, vmask, has
