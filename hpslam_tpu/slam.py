"""PointSLAM orchestrator — single host loop, no processes.

Reference: src/Point_SLAM.py (two mp.Process workers + a Manager process
sharing tensors and an RPC'd point cloud, Point_SLAM.py:158-192, 297-319).
TPU re-design (SURVEY.md §7 delta 1 and P1-P4): the tracker and mapper are
jitted steps interleaved deterministically by one host loop.

sync_method (deterministic realisations of the reference's polling
protocol, Tracker.py:342-354 / Mapper.py:1001-1016):
  * strict — mapper maps frame m (m %% every_frame == 0) before the tracker
    advances past m: exactly the reference's strict schedule.
  * loose — the reference lets the map lag the tracker by up to
    every_frame + every_frame//2 frames; here mapping of frame m is
    deferred until the tracker reaches m + every_frame, so tracking runs
    on a map that is one mapping period stale (the centre of the
    reference's allowed lag window).
  * free — no rate coupling in the reference; realised as a lag of
    2 * every_frame (the reference's loose upper bound rounded up).

State plane: shared tensors/Manager RPC (P2/P3) become plain members — pose
lists (numpy), decoder params + point levels (device pytrees).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .mapper import Mapper
from .ops import image as IM
from .models import decoder as Dec
from .state import NeuralPointCloud
from .tracker import Tracker
from .utils.datasets import get_dataset
from .utils.logger import Logger


class PointSLAM:
    def __init__(self, cfg: dict, args=None):
        self.cfg = cfg
        self.verbose = cfg.get("verbose", True)
        self.output = cfg["data"]["output"]
        self.ckptsdir = os.path.join(self.output, "ckpts")
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(self.ckptsdir, exist_ok=True)
        os.makedirs(os.path.join(self.output, "mesh"), exist_ok=True)
        os.makedirs(os.path.join(self.output, "tracking_vis"), exist_ok=True)
        os.makedirs(os.path.join(self.output, "mapping_vis"), exist_ok=True)

        cam = cfg["cam"]
        self.H, self.W = cam["H"], cam["W"]
        self.fx, self.fy = cam["fx"], cam["fy"]
        self.cx, self.cy = cam["cx"], cam["cy"]
        self.update_cam()

        self.scale = cfg["scale"]
        self.mcfg = Dec.ModelConfig.from_cfg(cfg)
        # optional SPMD device mesh (--mesh dp4,tp2 / mesh: "dp8" in YAML):
        # the production track_frame/map_scan programs shard their ray
        # batches over the mesh's dp axis (see parallel.mesh.shard_batch)
        self.mesh = None
        if cfg.get("mesh"):
            from .parallel.mesh import parse_mesh_spec
            self.mesh = parse_mesh_spec(cfg.get("mesh"))
            if self.verbose and self.mesh is not None:
                print(f"SPMD mesh axes: {dict(self.mesh.shape)}")
        seed = cfg.get("seed", 1219)
        self._seed = seed
        self.params = Dec.init_nicer(self._next_key(), self.mcfg)
        self.load_pretrain()

        self.frame_reader = get_dataset(cfg, scale=self.scale)
        self.n_img = len(self.frame_reader)
        self.estimate_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)
        self.gt_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)
        self.exposure_feat = 0.01 * np.asarray(
            jax.random.normal(self._next_key(),
                              (cfg["model"]["exposure_dim"],)), np.float32)

        self.npc = NeuralPointCloud(cfg)
        self.tracker = Tracker(cfg, self)
        self.mapper = Mapper(cfg, self)
        self.logger = Logger(cfg, self)
        from .utils.visualizer import Visualizer
        self.tracker_vis = Visualizer(
            cfg["tracking"]["vis_freq"], cfg["tracking"]["vis_inside_freq"],
            os.path.join(self.output, "tracking_vis"), self,
            self.tracker.rcfg, self.verbose)
        self.mapper_vis = Visualizer(
            cfg["mapping"]["vis_freq"], cfg["mapping"]["vis_inside_freq"],
            os.path.join(self.output, "mapping_vis"), self,
            self.mapper.rcfg, self.verbose)
        self.save_rendered_image = cfg["mapping"].get("save_rendered_image",
                                                      False)
        self.every_frame = cfg["mapping"]["every_frame"]
        sync = cfg.get("sync_method", "strict")
        self._map_lag = {"strict": 0, "loose": self.every_frame,
                         "free": 2 * self.every_frame}.get(sync, 0)
        self._pending_maps: list = []
        self._frame_buf: dict = {}
        self.ckpt_freq = cfg["mapping"]["ckpt_freq"]
        self.keyframe_every = cfg["mapping"]["keyframe_every"]
        self.end_correction = cfg["mapping"]["end_correction"]
        self.metrics_path = os.path.join(self.output, "metrics.jsonl")
        self._metrics_f = None
        from .utils.telemetry import Telemetry
        self.telemetry = Telemetry(cfg, self.output)

    # ------------------------------------------------------------------
    def _next_key(self):
        # Typed keys only: fetching any result computed from a RAW legacy
        # uint32 key permanently degrades every subsequent dispatch on the
        # tunnelled TPU runtime to ~6 s (empirically bisected).  One eager
        # fold_in (~30 ms) per call is cheap by comparison.
        self._key_counter = getattr(self, "_key_counter", 0) + 1
        if not hasattr(self, "_base_key"):
            self._base_key = jax.random.PRNGKey(self._seed)
        return jax.random.fold_in(self._base_key, self._key_counter)

    def update_cam(self):
        """Adjust intrinsics for crop_size / crop_edge
        (Point_SLAM.py:215-235)."""
        cfg = self.cfg
        if "crop_size" in cfg["cam"]:
            ch, cw = cfg["cam"]["crop_size"]
            sx, sy = cw / self.W, ch / self.H
            self.fx *= sx
            self.fy *= sy
            self.cx *= sx
            self.cy *= sy
            self.H, self.W = ch, cw
        e = cfg["cam"].get("crop_edge", 0) or 0
        if e > 0:
            self.H -= 2 * e
            self.W -= 2 * e
            self.cx -= e
            self.cy -= e

    def load_pretrain(self):
        """Load converted ConvONet geometry-decoder weights if present.

        The reference maps the checkpoint's 'coarse' decoder into BOTH
        geo_decoder_mid and geo_decoder_fine (Point_SLAM.py:237-260).  We
        consume an .npz produced by tools/convert_pretrained.py; absent
        file -> random init (the geometry decoders are frozen during
        mapping either way, so features absorb the representation).
        """
        path = self.cfg.get("pretrained_decoders", {}).get("middle_fine")
        if not path or not os.path.exists(path):
            return
        import numpy as _np
        data = _np.load(path)
        for level in ("geo_mid", "geo_fine"):
            core = self.params[level]["core"]
            for i in range(len(core["layers"])):
                core["layers"][i]["w"] = jax.numpy.asarray(data[f"pts_linears.{i}.w"])
                core["layers"][i]["b"] = jax.numpy.asarray(data[f"pts_linears.{i}.b"])
                core["fc_c"][i]["w"] = jax.numpy.asarray(data[f"fc_c.{i}.w"])
                core["fc_c"][i]["b"] = jax.numpy.asarray(data[f"fc_c.{i}.b"])
            core["out"]["w"] = jax.numpy.asarray(data["output_linear.w"])
            core["out"]["b"] = jax.numpy.asarray(data["output_linear.b"])
            if "embedder.B" in data:
                self.params[level]["B"] = jax.numpy.asarray(data["embedder.B"])
        if self.verbose:
            print(f"Loaded pretrained geometry decoders from {path}")

    def _log_metrics(self, record: dict):
        if self._metrics_f is None:
            self._metrics_f = open(self.metrics_path, "a")
        self._metrics_f.write(json.dumps(record) + "\n")
        self._metrics_f.flush()
        self.telemetry.log(record, step=record.get("idx"))

    # ------------------------------------------------------------------
    def _map_frame(self, idx: int, frame, c2w: np.ndarray,
                   color_refine: bool = False):
        t0 = time.perf_counter()
        self.params, self.exposure_feat, info = self.mapper.map(
            idx, frame, self.npc, self.params, self.exposure_feat,
            self._next_key(), c2w, color_refine=color_refine)
        if info.get("updated_c2w") is not None:  # BA adjusted current pose
            self.estimate_c2w_list[idx] = info["updated_c2w"]
            c2w = info["updated_c2w"]
        dt = time.perf_counter() - t0
        if self.verbose:
            print(f"[map] frame {idx}: +{info['frame_pts_add']} locs, "
                  f"{info['n_joint_iters']} iters, geo {info['geo_loss_last']:.3f}, "
                  f"col {info['color_loss_last']:.3f} ({dt:.2f}s)  pts "
                  f"{self.npc.pts_num()}")
        self._log_metrics({"event": "map", "idx": idx, "time_s": dt,
                           "pts": self.npc.pts_num(),
                           "geo_loss": info["geo_loss_last"],
                           "color_loss": info["color_loss_last"],
                           "geo_loss_curve": info["geo_loss_curve"],
                           "color_loss_curve": info["color_loss_curve"],
                           "iters": info["n_joint_iters"]})
        no_first = self.cfg["mapping"]["no_vis_on_first_frame"] and idx == 0
        if not no_first:
            self.mapper_vis.vis(idx, info["n_joint_iters"] - 1, frame.depth,
                                frame.color, c2w, self.npc, self.params,
                                info["r_query"], self.exposure_feat,
                                save_rendered_image=self.save_rendered_image)
        self.mapper.maybe_register_keyframe(
            idx, frame, c2w, self.gt_c2w_list[idx], info["r_query"],
            self.exposure_feat, self.n_img)
        return info

    def _save_point_clouds(self, final: bool):
        if len(self.npc.input_pos()) == 0:
            return
        cloud_pos = np.asarray(self.npc.input_pos(), np.float32)
        cloud_rgb = np.asarray(self.npc.input_rgb(), np.float32)
        if final:
            np.save(f"{self.output}/final_point_cloud",
                    np.hstack([cloud_pos, cloud_rgb]))
            for lvl in self.npc.levels:
                n = int(self.npc.levels[lvl].count)
                np.save(f"{self.output}/npc_cloud_{lvl}",
                        np.asarray(self.npc.levels[lvl].pos[:n]))
            from .utils.ply import write_ply_points
            write_ply_points(f"{self.output}/final_point_cloud.ply",
                             cloud_pos, cloud_rgb / 255.0)
            if self.verbose:
                print("Saved point cloud and point normals.")

    # ------------------------------------------------------------------
    def restore_from(self, path: str) -> int:
        """Resume a live run from a Logger checkpoint (exceeds the
        reference, whose .tar dumps are write-only and consumed solely by
        offline tools — src/utils/Logger.py, SURVEY.md §5).

        Restores the point store + input cloud, decoder params, exposure
        latent, pose lists, keyframe registry (images and device twins are
        re-read from the dataset — the Logger strips them), and the PRNG
        stream positions.  Returns the checkpointed frame idx; run()
        continues at idx+1.
        """
        from .utils.logger import load_checkpoint
        state = load_checkpoint(path)
        for name, lv in state["levels"].items():
            self.npc.restore_level(name, lv["pos"], lv["normal"],
                                   lv["geo"], lv["col"])
        self.npc.restore_input(state["input_pos"], state["input_rgb"],
                               state["input_normal"])
        self.params = jax.tree.map(jnp.asarray, state["decoder_params"])
        self.exposure_feat = np.asarray(state["exposure_feat"], np.float32)
        n = min(len(state["estimate_c2w_list"]), self.n_img)
        self.estimate_c2w_list[:n] = state["estimate_c2w_list"][:n]
        self.gt_c2w_list[:n] = state["gt_c2w_list"][:n]
        self.mapper.keyframe_list = list(state["keyframe_list"])
        self.mapper.selected_keyframes = state.get("selected_keyframes")
        self._key_counter = int(state.get("key_counter", 0))
        self.npc._key_counter = int(state.get("npc_key_counter", 0))
        kfs = []
        for kf in state["keyframe_dict"]:
            i = int(kf["idx"])
            fr = self.frame_reader[i]
            _r_add, r_query = self.tracker.prepare_radii(fr.color)
            H, W = fr.depth.shape
            pool = IM.valid_pixel_pool(fr.depth, 0, H, 0, W)
            pj = np.zeros((H * W,), np.int32)
            pj[: pool.size] = pool
            kfs.append({
                "idx": i,
                "color": fr.color.copy(),
                "depth": fr.depth.copy(),
                "gt_c2w": np.asarray(kf["gt_c2w"]),
                "est_c2w": np.asarray(kf["est_c2w"]),
                "r_query_mid": r_query["mid"],
                "r_query_fine": r_query["fine"],
                "exposure_feat": np.asarray(kf["exposure_feat"]),
                "color_j": fr.color_j,
                "depth_j": fr.depth_j,
                "rqm_j": jnp.asarray(r_query["mid"]),
                "rqf_j": jnp.asarray(r_query["fine"]),
                "pool_j": jnp.asarray(pj),
                "pool_len": int(max(pool.size, 1)),
            })
        self.mapper.keyframe_dict = kfs
        # last mapped pose for the reprojection point filter
        # (mapper.add_points_for_frame); the checkpointed frame is the
        # most recent mapped-or-tracked pose available
        self.mapper.prev_c2w = np.asarray(
            state["estimate_c2w_list"][state["idx"]], np.float32)
        if self.verbose:
            print(f"Resumed from {path} at frame {state['idx']} "
                  f"(pts {self.npc.pts_num()}, {len(kfs)} keyframes)")
        return int(state["idx"])

    # ------------------------------------------------------------------
    def run(self):
        """Strict-sync interleaved tracking+mapping over the sequence
        (replaces Point_SLAM.run + both worker loops)."""
        reader = self.frame_reader
        n = self.n_img
        track_times, map_times = [], []

        start = 0
        if self.cfg.get("resume"):
            from .utils.logger import latest_checkpoint
            ck = latest_checkpoint(self.output)
            if ck is not None:
                start = self.restore_from(ck) + 1
            elif self.verbose:
                print("resume requested but no checkpoint found; "
                      "starting fresh")

        # background-thread decode overlapping device compute
        # (DataLoader(num_workers=1) role, Tracker.py:95-96)
        from .utils.datasets import Prefetcher
        prefetcher = Prefetcher(reader, start=start)

        for idx, frame in enumerate(prefetcher, start=start):
            self.gt_c2w_list[idx] = frame.c2w

            # ---- tracking (frames 0-1 copy GT, Tracker.py:366-367)
            t0 = time.perf_counter()
            c2w, tinfo, op = self.tracker.track(
                idx, frame, self.npc, self.params, self.exposure_feat,
                self._next_key(), self.estimate_c2w_list, frame.c2w)
            ttime = time.perf_counter() - t0
            if op is not None and self.tracker.use_exposure:
                self.exposure_feat = np.asarray(op["expo_feat"])
                self.params = dict(self.params)
                self.params["col_mid"] = dict(self.params["col_mid"],
                                              exposure=op["expo_mid"])
                self.params["col_fine"] = dict(self.params["col_fine"],
                                               exposure=op["expo_fine"])
            self.estimate_c2w_list[idx] = c2w
            if idx > 1 and self.verbose and "loss_best" in tinfo:
                print(f"[track] frame {idx}: loss {tinfo['loss_init']:.2f}->"
                      f"{tinfo['loss_best']:.2f} quad_err "
                      f"{tinfo['cam_error_quad']:.4f} pos_err "
                      f"{tinfo['cam_error_pos']:.4f} ({ttime:.2f}s)")
            if not tinfo.get("skipped"):
                track_times.append(ttime)
                self._log_metrics({"event": "track", "idx": idx,
                                   "time_s": ttime,
                                   "loss": tinfo.get("loss_best"),
                                   "loss_curve": tinfo.get("loss_curve"),
                                   "quad_err": tinfo.get("cam_error_quad"),
                                   "pos_err": tinfo.get("cam_error_pos")})
                if idx % self.cfg["tracking"]["vis_freq"] == 0:
                    self.tracker_vis.vis(
                        idx, self.tracker.iters - 1, frame.depth, frame.color,
                        c2w, self.npc, self.params, tinfo["r_query"],
                        self.exposure_feat)

            # ---- mapping every Nth frame + final; loose/free defer the
            # map by a fixed tracker lag (see module docstring)
            if idx % self.every_frame == 0:
                self._pending_maps.append(idx)
                self._frame_buf[idx] = frame
            while self._pending_maps and (
                    idx - self._pending_maps[0] >= self._map_lag
                    or idx == n - 1):
                m = self._pending_maps.pop(0)
                mframe = self._frame_buf.pop(m)
                t0 = time.perf_counter()
                self._map_frame(m, mframe, self.estimate_c2w_list[m])
                map_times.append(time.perf_counter() - t0)
            if idx == n - 1 and idx % self.every_frame != 0:
                # final frame always mapped (reference maps idx == n-1)
                t0 = time.perf_counter()
                self._map_frame(idx, frame, self.estimate_c2w_list[idx])
                map_times.append(time.perf_counter() - t0)

            if (idx > 0 and idx % self.ckpt_freq == 0) or idx == n - 1:
                self.logger.log(idx, self.npc, self.params,
                                self.exposure_feat,
                                self.mapper.keyframe_list,
                                self.mapper.keyframe_dict,
                                self.mapper.selected_keyframes,
                                self.estimate_c2w_list, self.gt_c2w_list)
            if idx % 300 == 0 or idx == n - 1:
                self._save_point_clouds(final=(idx == n - 1))

        # ---- end-of-sequence colour refinement (Mapper.py:1061-1068:
        # 5 outer passes with doubled window, colour-only LRs)
        if self.cfg["mapping"]["color_refine"]:
            frame = reader[n - 1]
            for _ in range(5):
                self._map_frame(n - 1, frame, self.estimate_c2w_list[n - 1],
                                color_refine=True)
            print("Color refinement done.")

        # ---- end-of-sequence correction + evaluation
        if self.end_correction:
            try:
                from .tools.end_correction import apply_end_correction
                apply_end_correction(self)
            except Exception as e:  # noqa: BLE001 — mirror reference's guard
                print(f"End correction failed: {e}")

        results = None
        try:
            from .tools.eval_ate import evaluate_trajectory
            results = evaluate_trajectory(
                self.gt_c2w_list, self.estimate_c2w_list, self.n_img - 1,
                self.scale, plot=f"{self.output}/eval_ate_aligned.png",
                use_alignment=True)
            print("ate_rmse:", results)
            self._log_metrics({"event": "ate", **{
                k: float(v) for k, v in results.items()}})
        except Exception as e:  # noqa: BLE001
            print(f"Failed to evaluate trajectory: {e}")

        summary = {
            "track_ms_mean": 1e3 * float(np.mean(track_times)) if track_times else 0.0,
            "map_ms_mean": 1e3 * float(np.mean(map_times)) if map_times else 0.0,
            "n_frames": n,
        }
        self._log_metrics({"event": "summary", **summary})
        try:
            from .utils.telemetry import summarize_run
            plot = summarize_run(self.output)
            if plot:
                self.telemetry.log_image("run_summary", plot)
                if self.verbose:
                    print(f"Run summary plots: {plot}")
        except Exception as e:  # noqa: BLE001
            print(f"summary plots failed: {e}")
        self.telemetry.finish()
        return results, summary
