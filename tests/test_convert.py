"""Migration test: a reference-format torch checkpoint converted with
vts_tpu.utils.convert_torch must produce the SAME generator function.

The torch side is rebuilt here from torch primitives following the reference
architecture trace (models/networks.py:1430-1645 + unet_parts_custom.py:9-82)
— no reference code imported — then both models run the same input.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vts_tpu.networks.unet_custom import CustomUNet  # noqa: E402
from vts_tpu.utils.convert_torch import convert_custom_unet  # noqa: E402

ND = 8
G = 4
SEP = 4
IN_NC = 9
SIZE = 256


def _enc_feats(i):
    return G * min(2 ** min(i, 3), 8)


def make_reference_state_dict(rng):
    """Random weights under the reference's key naming."""
    sd = {}

    def conv(name, in_c, out_c, bias=True):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (out_c, in_c, 4, 4)).astype(np.float32))
        if bias:
            sd[f"{name}.bias"] = torch.from_numpy(
                rng.normal(0, 0.02, (out_c,)).astype(np.float32))

    def convt(name, in_c, out_c, bias=True):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (in_c, out_c, 4, 4)).astype(np.float32))
        if bias:
            sd[f"{name}.bias"] = torch.from_numpy(
                rng.normal(0, 0.02, (out_c,)).astype(np.float32))

    conv("down0.model.0", IN_NC, G)                      # outermost: conv only
    for i in range(1, ND):
        conv(f"down{i}.model.1", _enc_feats(i - 1), _enc_feats(i))
    # decoder
    convt(f"up{ND-1}.model.1", 8 * G, 8 * G)             # innermost, no concat
    for i in range(ND - 2, 0, -1):
        convt(f"up{i}.model.1", 2 * _enc_feats(i), _enc_feats(i - 1))
    convt("up0.model.1", G, 3)                           # outermost visual head
    for i in range(SEP - 1, 0, -1):
        convt(f"up{i}_T.model.1", 2 * _enc_feats(i), _enc_feats(i - 1))
    convt("up0_T.model.1", G, 2)
    return sd


def torch_forward(sd, x):
    """Reference CustomUnetGenerator forward from primitives (instance norm,
    lrelu(0.2) encoder / relu decoder, tanh heads, fork at level SEP-1)."""
    inorm = lambda t: F.instance_norm(t)

    skips = []
    h = x
    for i in range(ND):
        if i > 0:
            h = F.leaky_relu(h, 0.2)
        h = F.conv2d(h, sd[f"down{i}.model.{0 if i == 0 else 1}.weight"],
                     sd[f"down{i}.model.{0 if i == 0 else 1}.bias"],
                     stride=2, padding=1)
        if 0 < i < ND - 1:
            h = inorm(h)
        skips.append(h)

    def up(name, t):
        t = F.relu(t)
        t = F.conv_transpose2d(t, sd[f"{name}.model.1.weight"],
                               sd[f"{name}.model.1.bias"], stride=2, padding=1)
        return t

    h = skips[ND - 1]
    h_t = None
    for i in range(ND - 1, -1, -1):
        if i == SEP - 1:
            h_t = h
        if i == ND - 1:
            h = inorm(up(f"up{i}", h))
        elif i == 0:
            # outermost Up takes NO skip concat (reference unet_parts_custom.py:74-79)
            h = torch.tanh(up("up0", h))
            h_t = torch.tanh(up("up0_T", h_t))
        else:
            cat = torch.cat([h, skips[i]], 1)
            h = inorm(up(f"up{i}", cat))
            if h_t is not None and i <= SEP - 1:
                cat_t = torch.cat([h_t, skips[i]], 1)
                h_t = inorm(up(f"up{i}_T", cat_t))
    return torch.cat([h, h_t], 1)


def test_converted_checkpoint_matches_torch_forward():
    rng = np.random.default_rng(0)
    sd = make_reference_state_dict(rng)
    x = rng.uniform(-1, 1, (1, SIZE, SIZE, IN_NC)).astype(np.float32)

    y_torch = torch_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    y_torch = y_torch.detach().numpy().transpose(0, 2, 3, 1)

    params = convert_custom_unet(sd, num_downs=ND, num_layer_separate=SEP)
    net = CustomUNet(ngf=G, num_downs=ND, num_layer_separate=SEP, input_size=SIZE)
    ref_tree = net.init(jax.random.key(0), jnp.asarray(x))["params"]
    # converted tree must line up leaf-for-leaf with a fresh init
    ref_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
    got_paths = {jax.tree_util.keystr(p): np.asarray(l).shape
                 for p, l in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths

    y_jax = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    assert y_jax.shape == y_torch.shape
    np.testing.assert_allclose(y_jax, y_torch, rtol=1e-3, atol=2e-4)
