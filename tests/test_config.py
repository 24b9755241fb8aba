import os

from hpslam_tpu import config as C

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_inherit_chain():
    cfg = C.load_config(os.path.join(ROOT, "configs/ScanNet/scene0059.yaml"))
    # scene-level override
    assert cfg["mapping"]["bound"][0] == [-0.9, 7.3]
    # dataset-level override
    assert cfg["dataset"] == "scannet"
    assert cfg["tracking"]["iters"] == 100
    assert cfg["cam"]["crop_edge"] == 10
    assert cfg["model"]["encode_exposure"] is True
    # base-level value that nothing overrides
    assert cfg["pointcloud"]["nn_num"] == 8
    assert cfg["rendering"]["N_surface"] == 5
    # ScanNet overrides base surface band
    assert cfg["rendering"]["near_end_surface"] == 0.96
    # hierarchy dict intact with mid+fine
    rh = cfg["pointcloud"]["radius_hierarchy"]
    assert set(rh.keys()) == {"fine", "mid"}
    assert rh["mid"]["radius_add_max_mid"] == 0.48


def test_cli_overrides():
    cfg = C.load_config(os.path.join(ROOT, "configs/ScanNet/scene0059.yaml"))
    parser = C.build_arg_parser()
    args = parser.parse_args([
        "configs/ScanNet/scene0059.yaml", "--track_iter", "7",
        "--no_exposure", "--gt_camera", "--map_every", "2",
        "--output", "/tmp/xyz",
    ])
    cfg = C.apply_args(cfg, args)
    assert cfg["tracking"]["iters"] == 7
    assert cfg["model"]["encode_exposure"] is False
    assert cfg["tracking"]["gt_camera"] is True
    assert cfg["mapping"]["every_frame"] == 2
    assert cfg["data"]["output"] == "/tmp/xyz"


def test_model_config_from_cfg():
    from hpslam_tpu.models.decoder import ModelConfig
    cfg = C.load_config(os.path.join(ROOT, "configs/ScanNet/scannet.yaml"))
    m = ModelConfig.from_cfg(cfg)
    assert m.encode_exposure and not m.encode_rel_pos_in_col
    assert m.c_dim == 32 and m.N_surface == 5
