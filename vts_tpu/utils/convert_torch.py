"""Reference-checkpoint conversion: torch ``<epoch>_net_G.pth`` → our params.

Lets a user of the reference framework bring their pretrained sinskitG/skitG
generators (reference README.md:103-104 ships 20 of them) into vts_tpu:

  python -m vts_tpu.utils.convert_torch --input best_net_G.pth \\
      --output checkpoints/<name>/best_net_G.msgpack --arch unet256_custom

Layout rules (validated by tests/test_torch_parity.py):
  torch Conv2d   (out,in,kh,kw) → flax HWIO = transpose(2,3,1,0)
  torch ConvT2d  (in,out,kh,kw) → flax HWIO = transpose(2,3,0,1), spatially flipped

Reference CustomUnetGenerator naming (models/networks.py:1430-1532 +
thirdparty/unet/unet_parts_custom.py): ``down{i}.model.{j}`` where the conv
sits at j=0 (outermost) or j=1; ``up{i}[_T].model.1`` holds the ConvTranspose;
instance norm carries no parameters.  Style mapping layers:
``style_code_mapping{i}.0`` (Linear).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np


def _conv_w(t):
    return np.asarray(t).transpose(2, 3, 1, 0)


def _convt_w(t):
    return np.ascontiguousarray(np.asarray(t).transpose(2, 3, 0, 1)[::-1, ::-1])


def convert_custom_unet(sd: Dict, num_downs: int = 8,
                        num_layer_separate: int = 4) -> Dict:
    """Reference CustomUnetGenerator state_dict → our CustomUNet params tree."""
    params: Dict = {}

    def grab(key):
        t = sd[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    for i in range(num_downs):
        conv_idx = 0 if i == 0 else 1
        base = f"down{i}.model.{conv_idx}"
        entry = {"Conv_0": {"kernel": _conv_w(grab(f"{base}.weight"))}}
        if f"{base}.bias" in sd:
            entry["Conv_0"]["bias"] = grab(f"{base}.bias")
        params[f"down{i}"] = {"Conv4x4_0": entry}

    def up_entry(prefix):
        base = f"{prefix}.model.1"
        entry = {"ConvTranspose_0": {"kernel": _convt_w(grab(f"{base}.weight"))}}
        if f"{base}.bias" in sd:
            entry["ConvTranspose_0"]["bias"] = grab(f"{base}.bias")
        return {"ConvT4x4_0": entry}

    for i in range(num_downs):
        params[f"up{i}"] = up_entry(f"up{i}")
        if i < num_layer_separate and f"up{i}_T.model.1.weight" in sd:
            params[f"up{i}_T"] = up_entry(f"up{i}_T")

    # style-code projection layers (skitG 'project' mode)
    for k in list(sd):
        if k.startswith("style_code_mapping") and k.endswith(".0.weight"):
            idx = k[len("style_code_mapping"):].split(".")[0]
            params[f"style_code_mapping{idx}"] = {
                "Dense_0": {"kernel": grab(k).T}}
    return params


def convert_checkpoint(input_path: str, arch: str = "unet256_custom",
                       num_downs: int = 8, num_layer_separate: int = 4) -> Dict:
    import torch

    sd = torch.load(input_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    if arch == "unet256_custom":
        return convert_custom_unet(sd, num_downs, num_layer_separate)
    raise NotImplementedError(f"converter for arch {arch!r} not implemented yet")


def main(argv=None):
    from flax.serialization import msgpack_serialize

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--arch", default="unet256_custom")
    ap.add_argument("--num_downs", type=int, default=8)
    ap.add_argument("--num_layer_separate", type=int, default=4)
    args = ap.parse_args(argv)
    params = convert_checkpoint(args.input, args.arch, args.num_downs,
                                args.num_layer_separate)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(msgpack_serialize({"params": params, "stats": {}}))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
