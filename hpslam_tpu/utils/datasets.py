"""RGB-D dataset readers (host-side input pipeline).

Reference: src/utils/datasets.py (339 LoC of torch Datasets).  Re-design:
plain-numpy frame readers + a background prefetch thread feeding the device
pipeline — image decode stays on host (cv2), per SURVEY.md N3.

Conventions preserved from the reference:
* colour: BGR file -> RGB float in [0, 1]; depth: 16-bit png / exr scaled by
  ``png_depth_scale``; optional undistortion applied to colour only.
* optional ``crop_size`` resize (bilinear colour / nearest depth) then
  ``crop_edge`` trim; intrinsics adjusted by the caller (slam.update_cam).
* pose conventions per dataset: Replica/ScanNet/Azure/TUM flip the y/z
  columns (``c2w[:3, 1] *= -1; c2w[:3, 2] *= -1``) into the -z-forward frame
  (datasets.py:143-145, 213-215, 316-317).
* TUM: timestamp association of rgb/depth/pose lists (datasets.py:257-274),
  first pose re-based to identity.

Plus one new family: ``synthetic`` — an analytic textured cube room with an
orbiting camera, so the whole SLAM stack runs with zero downloads (used by
tests, bench, and verification).
"""
from __future__ import annotations

import glob
import os
import queue
import threading
from typing import List, Optional, Tuple

import cv2
import numpy as np

from ..ops.geometry import as_intrinsics_matrix


class Frame:
    __slots__ = ("index", "color", "depth", "c2w", "_color_j", "_depth_j")

    def __init__(self, index: int, color: np.ndarray, depth: np.ndarray,
                 c2w: np.ndarray):
        self.index = index
        self.color = color  # (H, W, 3) float32 RGB in [0,1]
        self.depth = depth  # (H, W) float32 metres
        self.c2w = c2w      # (4, 4) float32
        self._color_j = None
        self._depth_j = None

    # lazy device twins: the tracker, mapper, and visualizer all consume the
    # same frame — upload it once (host->device transfers through the
    # tunnelled TPU runtime are seconds per 100 MB)
    @property
    def color_j(self):
        if self._color_j is None:
            import jax.numpy as jnp
            self._color_j = jnp.asarray(self.color)
        return self._color_j

    @property
    def depth_j(self):
        if self._depth_j is None:
            import jax.numpy as jnp
            self._depth_j = jnp.asarray(self.depth)
        return self._depth_j


def _flip_yz(c2w: np.ndarray) -> np.ndarray:
    c2w = c2w.copy()
    c2w[:3, 1] *= -1
    c2w[:3, 2] *= -1
    return c2w


class BaseReader:
    """Common decode/resize/crop pipeline."""

    def __init__(self, cfg: dict, input_folder: Optional[str] = None,
                 scale: float = 1.0, device=None):
        cam = cfg["cam"]
        self.cfg = cfg
        self.scale = scale
        self.png_depth_scale = cam["png_depth_scale"]
        self.distortion = np.array(cam["distortion"]) if "distortion" in cam else None
        self.crop_size = cam.get("crop_size")
        self.crop_edge = cam.get("crop_edge", 0) or 0
        self.K = as_intrinsics_matrix(
            (cam["fx"], cam["fy"], cam["cx"], cam["cy"]))
        self.input_folder = input_folder or cfg["data"]["input_folder"]
        self.color_paths: List[str] = []
        self.depth_paths: List[str] = []
        self.poses: List[np.ndarray] = []

    def __len__(self):
        return self.n_img

    @property
    def n_img(self):
        return len(self.color_paths)

    def _decode_depth(self, path: str) -> np.ndarray:
        if path.endswith(".exr"):
            # cv2 builds usually ship without the OpenEXR codec (and gate
            # it behind OPENCV_IO_ENABLE_OPENEXR); decode with the
            # first-party codec instead (reference readEXR_onlydepth,
            # src/utils/datasets.py:12-44)
            from .exr import read_exr_depth
            d = read_exr_depth(path)
            if d is None:
                raise ValueError(f"{path}: no depth channel (Y/Z/R) found")
        else:
            d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if d is None:
                raise ValueError(f"failed to decode depth image {path}")
        return d.astype(np.float32) / self.png_depth_scale

    def __getitem__(self, index: int) -> Frame:
        color = cv2.imread(self.color_paths[index])
        depth = self._decode_depth(self.depth_paths[index])
        if self.distortion is not None:
            color = cv2.undistort(color, self.K, self.distortion)
        color = cv2.cvtColor(color, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        depth = depth * self.scale
        H, W = depth.shape
        if color.shape[:2] != (H, W):
            color = cv2.resize(color, (W, H))
        if self.crop_size is not None:
            h, w = self.crop_size
            color = cv2.resize(color, (w, h), interpolation=cv2.INTER_LINEAR)
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
        e = self.crop_edge
        if e > 0:
            color = color[e:-e, e:-e]
            depth = depth[e:-e, e:-e]
        c2w = self.poses[index].astype(np.float32).copy()
        c2w[:3, 3] *= self.scale
        return Frame(index, np.ascontiguousarray(color),
                     np.ascontiguousarray(depth), c2w)


class Replica(BaseReader):
    def __init__(self, cfg, input_folder=None, scale=1.0, device=None):
        super().__init__(cfg, input_folder, scale)
        self.color_paths = sorted(
            glob.glob(f"{self.input_folder}/results/frame*.jpg"))
        self.depth_paths = sorted(
            glob.glob(f"{self.input_folder}/results/depth*.png"))
        with open(f"{self.input_folder}/traj.txt") as f:
            lines = f.readlines()
        self.poses = [
            _flip_yz(np.array(list(map(float, lines[i].split()))).reshape(4, 4))
            for i in range(len(self.color_paths))
        ]


class ScanNet(BaseReader):
    def __init__(self, cfg, input_folder=None, scale=1.0, device=None):
        super().__init__(cfg, input_folder, scale)
        by_num = lambda p: int(os.path.basename(p).split(".")[0])
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "color", "*.jpg")), key=by_num)
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth", "*.png")), key=by_num)
        self.poses = []
        for p in sorted(glob.glob(os.path.join(self.input_folder, "pose", "*.txt")),
                        key=by_num):
            with open(p) as f:
                mat = np.array(
                    [list(map(float, ln.split())) for ln in f.readlines()]
                ).reshape(4, 4)
            self.poses.append(_flip_yz(mat))


class Azure(BaseReader):
    def __init__(self, cfg, input_folder=None, scale=1.0, device=None):
        super().__init__(cfg, input_folder, scale)
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "color", "*.jpg")))
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth", "*.png")))
        traj = os.path.join(self.input_folder, "scene", "trajectory.log")
        self.poses = []
        if os.path.exists(traj):
            with open(traj) as f:
                content = f.readlines()
            for i in range(0, len(content), 5):
                mat = np.array(
                    list(map(float, ("".join(content[i + 1:i + 5])).split()))
                ).reshape(4, 4)
                self.poses.append(_flip_yz(mat))
        else:
            self.poses = [np.eye(4) for _ in self.color_paths]


class CoFusion(BaseReader):
    def __init__(self, cfg, input_folder=None, scale=1.0, device=None):
        super().__init__(cfg, input_folder, scale)
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "colour", "*.png")))
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth_noise", "*.exr")))
        # identity proxy poses (reference: coordinate frame unalignable;
        # ATE alignment absorbs it, datasets.py:232-240)
        self.poses = [np.eye(4) for _ in self.color_paths]


class TUM_RGBD(BaseReader):
    def __init__(self, cfg, input_folder=None, scale=1.0, device=None,
                 frame_rate: int = 32):
        super().__init__(cfg, input_folder, scale)
        self._load(self.input_folder, frame_rate)

    @staticmethod
    def _parse_list(path, skiprows=0):
        return np.loadtxt(path, delimiter=" ", dtype=np.str_, skiprows=skiprows)

    @staticmethod
    def _associate(t_img, t_depth, t_pose, max_dt=0.08):
        pairs = []
        for i, t in enumerate(t_img):
            j = int(np.argmin(np.abs(t_depth - t)))
            k = int(np.argmin(np.abs(t_pose - t)))
            if abs(t_depth[j] - t) < max_dt and abs(t_pose[k] - t) < max_dt:
                pairs.append((i, j, k))
        return pairs

    def _load(self, folder, frame_rate):
        from scipy.spatial.transform import Rotation
        pose_file = os.path.join(folder, "groundtruth.txt")
        if not os.path.isfile(pose_file):
            pose_file = os.path.join(folder, "pose.txt")
        img = self._parse_list(os.path.join(folder, "rgb.txt"))
        dep = self._parse_list(os.path.join(folder, "depth.txt"))
        pose = self._parse_list(pose_file, skiprows=1)
        pose_vecs = pose[:, 1:].astype(np.float64)
        t_img = img[:, 0].astype(np.float64)
        t_dep = dep[:, 0].astype(np.float64)
        t_pose = pose[:, 0].astype(np.float64)
        assoc = self._associate(t_img, t_dep, t_pose)

        picks = [0]
        for i in range(1, len(assoc)):
            t0 = t_img[assoc[picks[-1]][0]]
            t1 = t_img[assoc[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                picks.append(i)

        inv_first = None
        for ix in picks:
            i, j, k = assoc[ix]
            self.color_paths.append(os.path.join(folder, str(img[i, 1])))
            self.depth_paths.append(os.path.join(folder, str(dep[j, 1])))
            c2w = np.eye(4)
            c2w[:3, :3] = Rotation.from_quat(pose_vecs[k][3:]).as_matrix()
            c2w[:3, 3] = pose_vecs[k][:3]
            if inv_first is None:
                inv_first = np.linalg.inv(c2w)
                c2w = np.eye(4)
            else:
                c2w = inv_first @ c2w
            self.poses.append(_flip_yz(c2w))


class Synthetic(BaseReader):
    """Analytic textured cube room with an orbiting camera (no files).

    Depth/colour are ray-cast against an axis-aligned box of half-size 2.5m
    with a procedural RGB texture; poses follow a smooth orbit.  Serves as
    the deterministic end-to-end fixture the reference lacks (SURVEY.md §4).

    Optional SENSOR MODEL (cfg.synthetic), default all off — stresses the
    ScanNet failure modes the clean fixture cannot (VERDICT r1 item 4):
      * depth_noise_std: multiplicative Gaussian depth noise, sigma =
        std * depth (Kinect-like range error growth);
      * depth_quant: quantisation step in metres (16-bit png depth);
      * depth_hole_frac: fraction of pixels dropped to 0 in blobs
        (specular/IR-shadow holes);
      * exposure_drift: per-frame global colour gain drifting sinusoidally
        by +-drift (exercises the exposure MLPs / affines);
      * texture_poor: fraction of the room (by wall x-extent) rendered
        with near-flat texture (exercises the dynamic add/query radii);
      * trajectory: 'orbit' (default quarter-orbit) or 'loop' — a full
        orbit returning to the start pose (exercises end_correction's
        tail-vs-early-cloud registration, reference Mapper.py:1080-1148).
    """

    HALF = 2.5

    def __init__(self, cfg, input_folder=None, scale=1.0, device=None):
        super().__init__(cfg, input_folder, scale)
        syn = cfg.get("synthetic", {})
        self._n = int(syn.get("n_frames", 30))
        self._radius = float(syn.get("radius", 1.2))
        self._depth_noise = float(syn.get("depth_noise_std", 0.0))
        self._depth_quant = float(syn.get("depth_quant", 0.0))
        self._hole_frac = float(syn.get("depth_hole_frac", 0.0))
        self._expo_drift = float(syn.get("exposure_drift", 0.0))
        self._chan_drift = float(syn.get("exposure_chan_drift", 0.0))
        self._gamma_drift = float(syn.get("gamma_drift", 0.0))
        self._texture_poor = float(syn.get("texture_poor", 0.0))
        self._trajectory = str(syn.get("trajectory", "orbit"))
        self._seed = int(cfg.get("seed", 1219))
        cam = cfg["cam"]
        self._H0, self._W0 = cam["H"], cam["W"]
        self._fx, self._fy = cam["fx"], cam["fy"]
        self._cx, self._cy = cam["cx"], cam["cy"]
        self.poses = [self._pose(i) for i in range(self._n)]

    @property
    def n_img(self):
        return self._n

    def __len__(self):
        return self._n

    def _pose(self, i: int) -> np.ndarray:
        frac = 1.0 if self._trajectory == "loop" else 0.25
        ang = 2 * np.pi * i / max(self._n, 1) * frac
        pos = np.array([self._radius * np.sin(ang), 0.3 * np.sin(2 * ang),
                        self._radius * np.cos(ang) - 0.5])
        yaw = ang * (1.0 if self._trajectory == "loop" else 0.6)
        cy_, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos
        return c2w

    @staticmethod
    def _texture(p: np.ndarray) -> np.ndarray:
        r = 0.5 + 0.5 * np.sin(3.1 * p[..., 0] + 1.7 * p[..., 1])
        g = 0.5 + 0.5 * np.sin(2.3 * p[..., 1] - 1.1 * p[..., 2] + 1.0)
        b = 0.5 + 0.5 * np.sin(1.9 * p[..., 2] + 2.9 * p[..., 0] + 2.0)
        return np.stack([r, g, b], -1).astype(np.float32)

    def __getitem__(self, index: int) -> Frame:
        H, W = self._H0, self._W0
        c2w = self.poses[index]
        jj, ii = np.mgrid[0:H, 0:W].astype(np.float32)
        dirs = np.stack([(ii - self._cx) / self._fx,
                         -(jj - self._cy) / self._fy,
                         -np.ones_like(ii)], -1)
        rd = dirs @ c2w[:3, :3].T
        ro = c2w[:3, 3]
        # slab intersection with the box interior (camera inside): take the
        # nearest positive exit along each axis
        t_exit = np.full((H, W), np.inf, np.float32)
        for ax in range(3):
            d = rd[..., ax]
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = (self.HALF - ro[ax]) / d
                t2 = (-self.HALF - ro[ax]) / d
            for t in (t1, t2):
                valid = np.isfinite(t) & (t > 1e-4)
                t_exit = np.where(valid & (t < t_exit), t, t_exit)
        depth_along_ray = t_exit
        hit = ro[None, None, :] + rd * depth_along_ray[..., None]
        color = self._texture(hit)
        if self._texture_poor > 0:
            # near-flat texture over part of the room: hit points with
            # x above the quantile boundary lose almost all colour
            # gradient (dynamic radii go to radius_add_max there)
            bound = self.HALF * (1.0 - 2.0 * self._texture_poor)
            flat = hit[..., 0] > bound
            color = np.where(flat[..., None],
                             0.55 + 0.02 * color, color).astype(np.float32)
        # sensor depth convention: distance along -z in camera frame equals
        # t (rays have dz=-1 before rotation)
        depth = depth_along_ray.astype(np.float32)

        # --- sensor model (deterministic per frame)
        srng = np.random.default_rng(self._seed * 100003 + index)
        if self._depth_noise > 0:
            depth = depth * (1.0 + self._depth_noise
                             * srng.standard_normal(depth.shape)
                             ).astype(np.float32)
        if self._depth_quant > 0:
            depth = (np.round(depth / self._depth_quant)
                     * self._depth_quant).astype(np.float32)
        if self._hole_frac > 0:
            # blob holes: threshold smoothed noise so dropouts cluster
            # like IR-shadow patches rather than salt-and-pepper
            g = srng.standard_normal((H // 8 + 1, W // 8 + 1))
            gg = np.kron(g, np.ones((8, 8)))[:H, :W]
            thr = np.quantile(gg, self._hole_frac)
            depth = np.where(gg < thr, 0.0, depth).astype(np.float32)
        if self._expo_drift > 0 or self._chan_drift > 0 \
                or self._gamma_drift > 0:
            # exposure model the reference's per-frame 3x3 affine + bias
            # (decoder.py:606-614) exists to absorb: global gain drift,
            # PER-CHANNEL gain drift (white-balance wander; phase-shifted
            # per channel so no scalar gain explains it), and a mild gamma
            # drift (nonlinear — only approximable by the affine, which
            # keeps the task honest).  The scalar drift alone measured too
            # weak to separate exposure ON/OFF from the seed band
            # (VERDICT r02 item 5 / QUALITY_MATRIX.json r02).
            ph = 2 * np.pi * index / max(self._n, 1)
            gain = 1.0 + self._expo_drift * np.sin(2.0 * ph)
            cg = gain * np.ones(3)
            if self._chan_drift > 0:
                cg = cg * (1.0 + self._chan_drift
                           * np.sin(2.0 * ph + np.array([0.0, 2.1, 4.2])))
            color = color * cg.astype(np.float32)
            if self._gamma_drift > 0:
                gamma = 1.0 + self._gamma_drift * np.sin(3.0 * ph + 1.0)
                color = np.power(np.clip(color, 0.0, None), gamma)
            color = np.clip(color, 0.0, 1.0).astype(np.float32)

        e = self.crop_edge
        if e > 0:
            color = color[e:-e, e:-e]
            depth = depth[e:-e, e:-e]
        return Frame(index, np.ascontiguousarray(color),
                     np.ascontiguousarray(depth), c2w.astype(np.float32))


dataset_registry = {
    "replica": Replica,
    "scannet": ScanNet,
    "cofusion": CoFusion,
    "azure": Azure,
    "tumrgbd": TUM_RGBD,
    "synthetic": Synthetic,
}


def get_dataset(cfg: dict, input_folder: Optional[str] = None,
                scale: float = 1.0, device=None) -> BaseReader:
    """Factory (reference datasets.py:47-48)."""
    return dataset_registry[cfg["dataset"]](cfg, input_folder, scale)


class Prefetcher:
    """Background-thread frame prefetch (replaces DataLoader(num_workers=1),
    Tracker.py:95-96).  cv2 releases the GIL during decode, so a single
    thread overlaps IO with device compute."""

    def __init__(self, reader: BaseReader, depth: int = 2, start: int = 0):
        self.reader = reader
        self.start = start
        self.q: "queue.Queue[Tuple[int, Frame]]" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        for i in range(self.start, len(self.reader)):
            if self._stop.is_set():
                return
            self.q.put((i, self.reader[i]))
        self.q.put((-1, None))

    def __iter__(self):
        while True:
            i, frame = self.q.get()
            if i < 0:
                return
            yield frame

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
