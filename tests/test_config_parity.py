"""Field-by-field parity of the repo's ScanNet configs vs the reference's.

VERDICT r02 item 6: the first real-data run must not be lost to a
transcription typo, so every numeric that drives the optimization is
diffed against the effective values the reference loader would produce
from /root/reference/configs (inherit_from chain + default base, the
semantics of reference src/config.py:10-39).

Intentional deltas are NOT compared: environment paths
(data.input_folder, data.output, wandb_dir, pretrained paths, device),
TPU-only additions (tracking.knn_probe/resample_stages/dense_cache,
mapping.union_size/knn_probe, seed), and mapping.mid_iter_ratio's base
default (the reference leaves it undefined outside ScanNet — a KeyError
in its base config; our base defines the ScanNet value 0.5, and the
ScanNet chain pins it in both).
"""
import glob
import os

import pytest
import yaml

REF_ROOT = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_ref(path):
    """Reference loader semantics (src/config.py:10-39): follow
    inherit_from (repo-root-relative), else fall back to the default base
    config; the child always wins."""
    with open(path) as f:
        special = yaml.safe_load(f)
    inherit = special.get("inherit_from")
    if inherit is not None:
        cfg = load_ref(os.path.join(REF_ROOT, inherit))
    else:
        base = os.path.join(REF_ROOT, "configs/point_slam.yaml")
        if os.path.abspath(base) != os.path.abspath(path):
            with open(base) as f:
                cfg = yaml.safe_load(f)
        else:
            cfg = {}
    return _merge(cfg, special)


def _get(cfg, dotted):
    cur = cfg
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return ("<missing>",)
        cur = cur[part]
    return cur


# every effective numeric the engines read (SURVEY.md §2 C1-C18 config
# surface); dotted paths into the merged dict
PARITY_KEYS = [
    # flat toggles
    "sync_method", "use_normals", "use_view_direction", "use_dynamic_radius",
    # model
    "model.c_dim", "model.exposure_dim", "model.encode_rel_pos_in_col",
    "model.encode_rel_pos_in_geo", "model.encode_exposure",
    "model.encode_viewd", "model.pos_embedding_method",
    # tracking budgets (scannet.yaml:14-26)
    "tracking.pixels", "tracking.iters", "tracking.lr",
    "tracking.separate_LR", "tracking.const_speed_assumption",
    "tracking.w_color_loss", "tracking.sample_with_color_grad",
    "tracking.ignore_edge_W", "tracking.ignore_edge_H",
    "tracking.use_color_in_tracking", "tracking.handle_dynamic",
    "tracking.depth_limit", "tracking.gt_camera",
    # mapping budgets (scannet.yaml:27-41)
    "mapping.every_frame", "mapping.BA", "mapping.BA_cam_lr",
    "mapping.geo_iter_ratio", "mapping.mapping_window_size",
    "mapping.keyframe_every", "mapping.pixels", "mapping.pixels_adding",
    "mapping.pixels_based_on_color_grad", "mapping.iters",
    "mapping.iters_first", "mapping.geo_iter_first",
    "mapping.end_correction", "mapping.w_color_loss",
    "mapping.more_iters_when_adding", "mapping.min_iter_ratio",
    "mapping.lr_first_factor", "mapping.lr_factor",
    "mapping.keyframe_selection_method", "mapping.frustum_edge",
    "mapping.fix_geo_decoder_mid", "mapping.fix_geo_decoder_fine",
    "mapping.fix_color_decoder", "mapping.filter_before_add_points",
    # per-stage LR tables
    "mapping.stage", "mapping.init",
    # rendering (point_slam.yaml:158-172 + scannet overrides)
    "rendering.N_samples", "rendering.N_surface", "rendering.N_importance",
    "rendering.near_end", "rendering.near_end_surface",
    "rendering.far_end_surface", "rendering.sigmoid_coef_tracker",
    "rendering.sigmoid_coef_mapper", "rendering.sample_near_pcl",
    "rendering.skip_zero_depth_pixel",
    # pointcloud / kNN / radii (point_slam.yaml:190-215)
    "pointcloud.nn_num", "pointcloud.min_nn_num", "pointcloud.N_add",
    "pointcloud.nn_weighting", "pointcloud.radius_add",
    "pointcloud.radius_min", "pointcloud.radius_query",
    "pointcloud.radius_hierarchy", "pointcloud.radius_query_ratio",
    "pointcloud.color_grad_threshold", "pointcloud.near_end_surface",
    "pointcloud.far_end_surface", "pointcloud.add_along_normals",
    "pointcloud.fix_interval_when_add_along_ray",
    # NOTE: pointcloud.radius_add_max/min appear in scannet.yaml's FIRST
    # `pointcloud:` block, which the SECOND `pointcloud:` block silently
    # replaces under YAML duplicate-key rules — in both repos alike, so
    # the effective values come from the base config (compared via
    # radius_add/radius_min above; the dynamic-radius path uses
    # radius_hierarchy anyway).
    # camera intrinsics (scannet.yaml:44-53)
    "cam.H", "cam.W", "cam.fx", "cam.fy", "cam.cx", "cam.cy",
    "cam.png_depth_scale", "cam.crop_edge",
    # scene bounds
    "mapping.bound", "mapping.marching_cubes_bound",
]


SCENES = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(REF_ROOT, "configs/ScanNet/scene*.yaml")))


@pytest.mark.parametrize("scene", SCENES)
def test_scannet_scene_config_parity(scene):
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference tree not mounted")
    repo_path = os.path.join(REPO_ROOT, "configs/ScanNet", scene)
    assert os.path.exists(repo_path), f"missing repo config for {scene}"

    from hpslam_tpu.config import load_config
    ours = load_config(repo_path,
                       os.path.join(REPO_ROOT, "configs/point_slam.yaml"))
    ref = load_ref(os.path.join(REF_ROOT, "configs/ScanNet", scene))

    bad = []
    for key in PARITY_KEYS:
        ov, rv = _get(ours, key), _get(ref, key)
        if ov != rv:
            bad.append(f"{key}: ours={ov!r} ref={rv!r}")
    assert not bad, f"{scene} effective-config drift:\n" + "\n".join(bad)
