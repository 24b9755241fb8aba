"""Checkpointing (reference src/utils/Logger.py — torch.save .tar dumps).

Re-design: a single pickle per checkpoint holding numpy-converted state.
Unlike the reference (write-only checkpoints consumed solely by offline
tools, SURVEY.md §5), ``load``/``restore`` also supports resuming a live
run.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np


def _to_np(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class Logger:
    def __init__(self, cfg: dict, slam):
        self.verbose = cfg.get("verbose", True)
        self.ckptsdir = slam.ckptsdir
        self.slam = slam
        self.save_keyframe_images = cfg["mapping"].get(
            "save_keyframe_images", False)

    def log(self, idx: int, npc, params, exposure_feat, keyframe_list,
            keyframe_dict, selected_keyframes, estimate_c2w_list,
            gt_c2w_list):
        path = os.path.join(self.ckptsdir, f"{idx:05d}.ckpt")
        levels = {}
        for name, lv in npc.levels.items():
            n = int(lv.count)
            levels[name] = {
                "pos": np.asarray(lv.pos[:n]),
                "normal": np.asarray(lv.normal[:n]),
                "geo": np.asarray(lv.geo[:n]),
                "col": np.asarray(lv.col[:n]),
                "count": n,
            }
        kf_dict = []
        for kf in keyframe_dict:
            entry = {k: v for k, v in kf.items()
                     if not k.endswith("_j")  # device twins stay on device
                     and (self.save_keyframe_images
                          or k not in ("color", "depth", "r_query_mid",
                                       "r_query_fine"))}
            kf_dict.append(entry)
        state = {
            "levels": levels,
            "pts_num": npc.pts_num(),
            "input_pos": np.asarray(npc.input_pos(), np.float32),
            "input_rgb": np.asarray(npc.input_rgb(), np.float32),
            "input_normal": np.asarray(npc.input_normal(), np.float32),
            "decoder_params": _to_np(params),
            "exposure_feat": np.asarray(exposure_feat),
            "gt_c2w_list": np.asarray(gt_c2w_list),
            "estimate_c2w_list": np.asarray(estimate_c2w_list),
            "keyframe_list": list(keyframe_list),
            "keyframe_dict": kf_dict,
            "selected_keyframes": selected_keyframes,
            "idx": idx,
            # PRNG stream positions (resume replay fidelity)
            "key_counter": getattr(self.slam, "_key_counter", 0),
            "npc_key_counter": getattr(npc, "_key_counter", 0),
        }
        with open(path, "wb") as f:
            pickle.dump(state, f, protocol=4)
        if self.verbose:
            print(f"Saved checkpoint {path}")
        return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(output: str) -> Optional[str]:
    d = os.path.join(output, "ckpts")
    if not os.path.isdir(d):
        return None
    cks = sorted(p for p in os.listdir(d) if p.endswith(".ckpt"))
    return os.path.join(d, cks[-1]) if cks else None
