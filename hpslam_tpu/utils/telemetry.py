"""Run observability: JSONL metrics + end-of-run plots + optional wandb.

wandb-role replacement (the reference logs per-iteration losses, camera
errors, point totals, clouds and panels to wandb — src/Tracker.py:454-459,
src/Mapper.py:877-914, 1196-1202).  Here every record always lands in
``metrics.jsonl``; if wandb is importable AND ``cfg['wandb']`` is true the
same records are mirrored to it; and ``summarize_run`` renders local plot
artifacts from the JSONL at end of run, so the rich-observability role
works with zero external services.
"""
from __future__ import annotations

import json
import os
from typing import Optional


class Telemetry:
    def __init__(self, cfg: dict, output: str):
        self.enabled = bool(cfg.get("wandb", False))
        self._wb = None
        if self.enabled:
            try:
                import wandb  # optional; not in the baked image
                self._wb = wandb.init(
                    project=cfg.get("project_name", "hpslam_tpu"),
                    dir=output, config=cfg)
            except Exception as e:  # noqa: BLE001 — degrade to JSONL-only
                print(f"wandb unavailable ({e}); metrics.jsonl only")
                self._wb = None

    def log(self, record: dict, step: Optional[int] = None):
        if self._wb is not None:
            try:
                flat = {k: v for k, v in record.items()
                        if isinstance(v, (int, float, str))}
                self._wb.log(flat, step=step)
            except Exception:  # noqa: BLE001
                pass

    def log_image(self, name: str, path: str, step: Optional[int] = None):
        if self._wb is not None:
            try:
                import wandb
                self._wb.log({name: wandb.Image(path)}, step=step)
            except Exception:  # noqa: BLE001
                pass

    def finish(self):
        if self._wb is not None:
            try:
                self._wb.finish()
            except Exception:  # noqa: BLE001
                pass


def summarize_run(output: str) -> Optional[str]:
    """Render metrics.jsonl into plots/summary.png.  Returns the path."""
    path = os.path.join(output, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    track_idx, track_loss, pos_err = [], [], []
    map_idx, geo_loss, col_loss, pts_fine, pts_mid = [], [], [], [], []
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("event") == "track":
                track_idx.append(r["idx"])
                track_loss.append(r.get("loss") or 0.0)
                pos_err.append(r.get("pos_err") or 0.0)
            elif r.get("event") == "map":
                map_idx.append(r["idx"])
                geo_loss.append(r.get("geo_loss") or 0.0)
                col_loss.append(r.get("color_loss") or 0.0)
                p = r.get("pts") or {}
                pts_fine.append(p.get("fine", 0))
                pts_mid.append(p.get("mid", 0))
    if not track_idx and not map_idx:
        return None
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    ax = axes[0, 0]
    ax.plot(track_idx, track_loss, lw=0.8)
    ax.set_title("tracking best loss / frame")
    ax = axes[0, 1]
    ax.plot(track_idx, pos_err, lw=0.8, color="tab:red")
    ax.set_title("camera position error vs GT (m)")
    ax = axes[1, 0]
    ax.plot(map_idx, geo_loss, lw=0.8, label="geo")
    ax.plot(map_idx, col_loss, lw=0.8, label="color")
    ax.set_title("mapping final losses / mapped frame")
    ax.legend()
    ax = axes[1, 1]
    ax.plot(map_idx, pts_fine, lw=0.8, label="fine")
    ax.plot(map_idx, pts_mid, lw=0.8, label="mid")
    ax.set_title("neural point count")
    ax.legend()
    for a in axes.ravel():
        a.set_xlabel("frame")
        a.grid(alpha=0.3)
    fig.tight_layout()
    out_dir = os.path.join(output, "plots")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "summary.png")
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return out
