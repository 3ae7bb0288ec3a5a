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


def _grab(sd, key):
    t = sd[key]
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_entry(sd, base, transposed=False):
    """torch ``{base}.weight[/bias]`` → flax Conv/ConvTranspose param dict."""
    w = _grab(sd, f"{base}.weight")
    entry = {"kernel": _convt_w(w) if transposed else _conv_w(w)}
    if f"{base}.bias" in sd:
        entry["bias"] = _grab(sd, f"{base}.bias")
    return entry


def convert_resnet(sd: Dict, n_blocks: int = 9, n_downsampling: int = 2,
                   n_upsampling: int = None, no_antialias: bool = False,
                   no_antialias_up: bool = False,
                   use_dropout: bool = False) -> Dict:
    """Reference ``ResnetGenerator`` state_dict (models/networks.py:1051-1155,
    normG=instance) → our :class:`ResnetGenerator` params.

    Walks the reference's ``nn.Sequential`` index layout (pad/conv/norm/relu
    [+Downsample] per stage; ResnetBlock conv_block convs at 1 and 5 — 6 with
    dropout) and maps onto our flax auto-names (``Conv_i`` in call order,
    ``ResnetBlock_b/Conv_{0,1}``, ``ConvTranspose_i`` when no_antialias_up).
    The antialiasing FIR filters are fixed buffers — not converted."""
    if n_upsampling is None:
        n_upsampling = n_downsampling
    params: Dict = {}
    n_conv = 0  # flax Conv_* counter

    def put_conv(tbase, transposed=False, name=None):
        nonlocal n_conv
        if name is None:
            name = f"Conv_{n_conv}"
            n_conv += 1
        params[name] = _conv_entry(sd, tbase, transposed)

    put_conv("model.1")  # 7x7 stem (idx 0 is ReflectionPad)
    per_down = 3 if no_antialias else 4  # [conv,norm,relu(,Downsample)]
    for i in range(n_downsampling):
        put_conv(f"model.{4 + per_down * i}")
    s0 = 4 + per_down * n_downsampling
    c2 = 6 if use_dropout else 5  # second conv_block conv index
    for b in range(n_blocks):
        params[f"ResnetBlock_{b}"] = {
            "Conv_0": _conv_entry(sd, f"model.{s0 + b}.conv_block.1"),
            "Conv_1": _conv_entry(sd, f"model.{s0 + b}.conv_block.{c2}"),
        }
    s1 = s0 + n_blocks
    for i in range(n_upsampling):
        if no_antialias_up:  # [ConvT,norm,relu]
            put_conv(f"model.{s1 + 3 * i}", transposed=True,
                     name=f"ConvTranspose_{i}")
        else:                # [Upsample,conv,norm,relu]
            put_conv(f"model.{s1 + 4 * i + 1}")
    per_up = 3 if no_antialias_up else 4
    put_conv(f"model.{s1 + per_up * n_upsampling + 1}")  # 7x7 tanh head
    return params


def convert_global(sd: Dict, n_downsampling: int = 3, n_blocks: int = 9) -> Dict:
    """Reference pix2pixHD ``GlobalGenerator`` (models/networks.py:1953-1984,
    normG=instance) → our :class:`GlobalGenerator` params
    ({"core": stem/downs/blocks/ups, "Conv_0": 7×7 tanh head})."""
    core: Dict = {"Conv_0": _conv_entry(sd, "model.1")}
    for i in range(n_downsampling):  # [conv s2, norm, relu] per stage
        core[f"Conv_{1 + i}"] = _conv_entry(sd, f"model.{4 + 3 * i}")
    s0 = 4 + 3 * n_downsampling
    for b in range(n_blocks):
        core[f"ResnetBlock_{b}"] = {
            "Conv_0": _conv_entry(sd, f"model.{s0 + b}.conv_block.1"),
            "Conv_1": _conv_entry(sd, f"model.{s0 + b}.conv_block.5"),
        }
    s1 = s0 + n_blocks
    for i in range(n_downsampling):  # [ConvT, norm, relu]
        core[f"ConvTranspose_{i}"] = _conv_entry(sd, f"model.{s1 + 3 * i}",
                                                 transposed=True)
    head = _conv_entry(sd, f"model.{s1 + 3 * n_downsampling + 1}")
    return {"core": core, "Conv_0": head}


def convert_encoder(sd: Dict, n_downsampling: int = 4) -> Dict:
    """Reference pix2pixHD ``Encoder`` (models/networks.py:1986-2019) — the
    instance-feature encoder — → our :class:`Encoder` params (flat scope:
    stem Conv_0, downs Conv_{1..nd}, ups ConvTranspose_{0..nd-1}, head
    Conv_{nd+1}; instance-wise average pooling is a runtime op)."""
    params: Dict = {"Conv_0": _conv_entry(sd, "model.1")}
    for i in range(n_downsampling):
        params[f"Conv_{1 + i}"] = _conv_entry(sd, f"model.{4 + 3 * i}")
    s1 = 4 + 3 * n_downsampling
    for i in range(n_downsampling):
        params[f"ConvTranspose_{i}"] = _conv_entry(sd, f"model.{s1 + 3 * i}",
                                                   transposed=True)
    params[f"Conv_{n_downsampling + 1}"] = _conv_entry(
        sd, f"model.{s1 + 3 * n_downsampling + 1}")
    return params


def convert_local(sd: Dict, n_local_enhancers: int = 1,
                  n_downsample_global: int = 3, n_blocks_global: int = 9,
                  n_blocks_local: int = 3) -> Dict:
    """Reference pix2pixHD ``LocalEnhancer`` (models/networks.py:1897-1950)
    → our :class:`LocalEnhancer` params.

    Torch layout: ``model.*`` holds the GlobalGenerator core minus its final
    [pad, conv7, Tanh]; per enhancer level n, ``model{n}_1`` = [pad, conv7,
    norm, relu, conv3s2, norm, relu] (convs at 1 and 4) and ``model{n}_2`` =
    [ResnetBlock×L, ConvT(at L), norm, relu(, pad, conv7(at L+4), Tanh on the
    last level)].  Our flax auto-names share one counter across levels:
    level n uses Conv_{2(n-1)}, Conv_{2(n-1)+1}, ResnetBlock_{L(n-1)+b},
    ConvTranspose_{n-1}; the final head is Conv_{2·n_local_enhancers}."""
    core: Dict = {"Conv_0": _conv_entry(sd, "model.1")}
    for i in range(n_downsample_global):
        core[f"Conv_{1 + i}"] = _conv_entry(sd, f"model.{4 + 3 * i}")
    s0 = 4 + 3 * n_downsample_global
    for b in range(n_blocks_global):
        core[f"ResnetBlock_{b}"] = {
            "Conv_0": _conv_entry(sd, f"model.{s0 + b}.conv_block.1"),
            "Conv_1": _conv_entry(sd, f"model.{s0 + b}.conv_block.5"),
        }
    s1 = s0 + n_blocks_global
    for i in range(n_downsample_global):
        core[f"ConvTranspose_{i}"] = _conv_entry(sd, f"model.{s1 + 3 * i}",
                                                 transposed=True)
    params: Dict = {"global": core}
    for n in range(1, n_local_enhancers + 1):
        params[f"Conv_{2 * (n - 1)}"] = _conv_entry(sd, f"model{n}_1.1")
        params[f"Conv_{2 * (n - 1) + 1}"] = _conv_entry(sd, f"model{n}_1.4")
        for b in range(n_blocks_local):
            params[f"ResnetBlock_{n_blocks_local * (n - 1) + b}"] = {
                "Conv_0": _conv_entry(sd, f"model{n}_2.{b}.conv_block.1"),
                "Conv_1": _conv_entry(sd, f"model{n}_2.{b}.conv_block.5"),
            }
        params[f"ConvTranspose_{n - 1}"] = _conv_entry(
            sd, f"model{n}_2.{n_blocks_local}", transposed=True)
    params[f"Conv_{2 * n_local_enhancers}"] = _conv_entry(
        sd, f"model{n_local_enhancers}_2.{n_blocks_local + 4}")
    return params


def convert_spade(sd: Dict, num_upsampling_layers: int = 3,
                  use_vae: bool = False, ngf: int = None,
                  sh: int = None, sw: int = None):
    """Reference ``SPADEGenerator`` (models/networks.py:2075-2201 +
    architecture.py:21-68 + normalization.py:68-112) → (params, batch_stats).

    Torch ``spectral_norm`` stores ``weight_orig``/``weight_u``; we copy the
    raw kernel into params and the ``u`` estimate into batch_stats (our
    power iteration and sigma are basis-independent over the flattened axis,
    so forwards agree given the same ``u``).  SPADE's param-free batch norm
    running stats map to ``BatchNorm_0.{mean,var}``."""
    params: Dict = {}
    stats: Dict = {}

    if use_vae:
        # torch: fc(z).view(-1, 16·nf, sh, sw) — output axis flattened as
        # (C, H, W); our NHWC reshape expects (H, W, C), so the Dense
        # kernel/bias out-axis must be permuted (needs ngf/sh/sw)
        assert None not in (ngf, sh, sw), "VAE fc conversion needs ngf/sh/sw"
        w = _grab(sd, "fc.weight")                       # (C·H·W, z_dim)
        w = w.reshape(16 * ngf, sh, sw, -1).transpose(1, 2, 0, 3)
        params["fc"] = {"kernel": w.reshape(16 * ngf * sh * sw, -1).T}
        if "fc.bias" in sd:
            b = _grab(sd, "fc.bias").reshape(16 * ngf, sh, sw)
            params["fc"]["bias"] = b.transpose(1, 2, 0).reshape(-1)
    else:
        if "fc.weight" in sd and getattr(sd["fc.weight"], "ndim", 4) == 2:
            raise ValueError(
                "checkpoint's fc.weight is 2-D (a VAE Dense layer) — this is "
                "a use_vae SPADE checkpoint; pass use_vae=True plus "
                "ngf/sh/sw (CLI: --set use_vae=1 --set ngf=64 --set sh=.. "
                "--set sw=..)")
        params["fc"] = _conv_entry(sd, "fc")

    blocks = ["head_0", "G_middle_0", "G_middle_1", "up_0"]
    blocks += [f"up_{i}" for i in range(1, min(num_upsampling_layers - 1, 4))]
    if num_upsampling_layers > 6:
        blocks.append("up_4")

    for blk in blocks:
        bp: Dict = {}
        bs: Dict = {}
        convs = ["conv_0", "conv_1"]
        if f"{blk}.conv_s.weight_orig" in sd or f"{blk}.conv_s.weight" in sd:
            convs.append("conv_s")
        for cv in convs:
            if f"{blk}.{cv}.weight_orig" in sd:  # spectral-normed
                w = _grab(sd, f"{blk}.{cv}.weight_orig")
                bp[cv] = {"kernel": _conv_w(w)}
                bs[cv] = {"u": _grab(sd, f"{blk}.{cv}.weight_u")}
            else:
                bp[cv] = _conv_entry(sd, f"{blk}.{cv}")
            if f"{blk}.{cv}.bias" in sd:
                bp[cv]["bias"] = _grab(sd, f"{blk}.{cv}.bias")
        norms = ["norm_0", "norm_1"] + (["norm_s"] if "conv_s" in convs else [])
        for nm in norms:
            bp[nm] = {
                "mlp_shared": _conv_entry(sd, f"{blk}.{nm}.mlp_shared.0"),
                "mlp_gamma": _conv_entry(sd, f"{blk}.{nm}.mlp_gamma"),
                "mlp_beta": _conv_entry(sd, f"{blk}.{nm}.mlp_beta"),
            }
            rm = f"{blk}.{nm}.param_free_norm.running_mean"
            if rm in sd:
                bs.setdefault(nm, {})["BatchNorm_0"] = {
                    "mean": _grab(sd, rm),
                    "var": _grab(sd, f"{blk}.{nm}.param_free_norm.running_var"),
                }
        params[blk] = bp
        if bs:
            stats[blk] = bs
    params["conv_img"] = _conv_entry(sd, "conv_img")
    return params, stats


def convert_checkpoint(input_path: str, arch: str = "unet256_custom",
                       num_downs: int = 8, num_layer_separate: int = 4,
                       **kw) -> Dict:
    import torch

    sd = torch.load(input_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    if arch == "unet256_custom":
        return {"params": convert_custom_unet(sd, num_downs, num_layer_separate),
                "stats": {}}
    if arch.startswith("resnet_") and arch.endswith("blocks"):
        n_blocks = int(arch[len("resnet_"):-len("blocks")])
        return {"params": convert_resnet(sd, n_blocks=n_blocks, **kw), "stats": {}}
    if arch == "global":
        return {"params": convert_global(sd, **kw), "stats": {}}
    if arch == "local":
        return {"params": convert_local(sd, **kw), "stats": {}}
    if arch == "encoder":
        return {"params": convert_encoder(sd, **kw), "stats": {}}
    if arch == "spade":
        params, stats = convert_spade(sd, **kw)
        return {"params": params, "stats": stats}
    raise NotImplementedError(f"converter for arch {arch!r} not implemented yet")


def main(argv=None):
    from flax.serialization import msgpack_serialize

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--arch", default="unet256_custom")
    ap.add_argument("--num_downs", type=int, default=8)
    ap.add_argument("--num_layer_separate", type=int, default=4)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="per-arch converter kwargs, repeatable (e.g. "
                         "--set n_downsampling=4 --set use_vae=1 --set ngf=64 "
                         "--set sh=4 --set sw=4 --set no_antialias=1); values "
                         "parse as int/float/bool where possible")
    args = ap.parse_args(argv)

    def parse_val(v: str):
        low = v.lower()
        if low in ("true", "false"):
            return low == "true"
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return v

    kw = {}
    for item in args.set:
        key, eq, val = item.partition("=")
        if not eq:
            ap.error(f"--set expects KEY=VALUE, got {item!r}")
        kw[key] = parse_val(val)
    payload = convert_checkpoint(args.input, args.arch, args.num_downs,
                                 args.num_layer_separate, **kw)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(msgpack_serialize(payload))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
