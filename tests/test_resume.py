"""Checkpoint -> live-resume round trip (framework extension over the
reference's write-only .tar dumps, src/utils/Logger.py)."""
import copy
import os

import numpy as np
import pytest


def _cfg(out, n_frames, ckpt_freq):
    from hpslam_tpu import config as C
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = C.load_config(
        os.path.join(here, "configs/Synthetic/synth_quick.yaml"),
        os.path.join(here, "configs/point_slam.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["synthetic"]["n_frames"] = n_frames
    cfg["data"]["output"] = out
    cfg["mapping"]["ckpt_freq"] = ckpt_freq
    cfg["mapping"]["every_frame"] = 3
    cfg["mapping"]["iters"] = 6
    cfg["mapping"]["iters_first"] = 8
    cfg["tracking"]["iters"] = 4
    cfg["tracking"]["pixels"] = 200
    cfg["mapping"]["pixels"] = 300
    cfg["mapping"]["vis_freq"] = 500
    cfg["tracking"]["vis_freq"] = 500
    cfg["verbose"] = False
    return cfg


@pytest.mark.slow
def test_resume_roundtrip(tmp_path):
    from hpslam_tpu.slam import PointSLAM
    out = str(tmp_path / "run")

    # first half: 6 frames, checkpoint every 4 -> ckpt at idx 4 and 5(final)
    slam1 = PointSLAM(_cfg(out, 6, 4))
    slam1.run()
    pts1 = slam1.npc.pts_num()
    kfs1 = list(slam1.mapper.keyframe_list)
    assert pts1["fine"] > 0 and len(kfs1) > 0

    # resume over a longer sequence from the final checkpoint
    cfg2 = _cfg(out, 9, 100)
    cfg2["resume"] = True
    slam2 = PointSLAM(cfg2)
    results, summary = slam2.run()

    # restored state matches the first run at the handoff
    assert slam2.mapper.keyframe_list[: len(kfs1)] == kfs1
    assert all(slam2.npc.pts_num()[k] >= pts1[k] for k in pts1)
    # earlier poses carried over, later poses filled in
    assert np.allclose(slam2.estimate_c2w_list[:6],
                       slam1.estimate_c2w_list[:6])
    assert np.abs(slam2.estimate_c2w_list[6:9]).sum() > 0
    assert results is not None and np.isfinite(
        results["absolute_translational_error.rmse"])
