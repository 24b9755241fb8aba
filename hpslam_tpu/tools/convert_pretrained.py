"""Convert the reference's pretrained ConvONet geometry checkpoint
(``pretrained/middle_fine.pt``, torch) into the .npz consumed by
slam.load_pretrain.

The reference extracts the checkpoint's 'coarse' decoder weights and loads
them into BOTH geometry decoders (Point_SLAM.py:237-260).  The torch model
keys map onto our functional pytree as:

    model.decoder.coarse.pts_linears.{i}.weight -> pts_linears.{i}.w (T)
    model.decoder.coarse.fc_c.{i}.weight        -> fc_c.{i}.w (T)
    model.decoder.coarse.output_linear.weight   -> output_linear.w (T)
    (embedder._B if present)                    -> embedder.B

Usage: python -m hpslam_tpu.tools.convert_pretrained middle_fine.pt out.npz
"""
from __future__ import annotations

import argparse

import numpy as np


def convert(in_path: str, out_path: str) -> dict:
    import torch
    ckpt = torch.load(in_path, map_location="cpu")
    model = ckpt.get("model", ckpt)
    out = {}
    prefix = None
    for key in model.keys():
        if "decoder" in key and "coarse" in key and "encoder" not in key:
            prefix = key.split("coarse")[0] + "coarse."
            break
    if prefix is None:
        raise ValueError("no coarse decoder keys found in checkpoint")
    for key, val in model.items():
        if not key.startswith(prefix):
            continue
        sub = key[len(prefix):]
        arr = val.detach().numpy()
        if sub.endswith(".weight"):
            out[sub[:-7] + ".w"] = arr.T  # torch Linear stores (out, in)
        elif sub.endswith(".bias"):
            out[sub[:-5] + ".b"] = arr
        elif sub.endswith("_B") or sub.endswith(".B"):
            out["embedder.B"] = arr
    np.savez(out_path, **out)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out_npz")
    args = p.parse_args(argv)
    out = convert(args.torch_ckpt, args.out_npz)
    print(f"wrote {args.out_npz} with {len(out)} arrays:",
          sorted(out.keys()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
