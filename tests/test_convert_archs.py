"""Converter equivalence for the baseline generator archs (VERDICT r1 item 5).

For each shipped ``--netG`` the torch side is rebuilt here from torch's
public API following the reference architecture trace (ResnetGenerator
models/networks.py:1051-1155, GlobalGenerator :1953-1984, SPADEGenerator
:2075-2201 + architecture.py:21-68 + normalization.py:68-112) — no reference
code imported — then a random reference-format state_dict is converted with
vts_tpu.utils.convert_torch and both forwards must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vts_tpu.networks.blocks import binomial_filter_2d  # noqa: E402
from vts_tpu.networks.pix2pixhd_nets import GlobalGenerator  # noqa: E402
from vts_tpu.networks.resnet_gen import ResnetGenerator  # noqa: E402
from vts_tpu.networks.spade_nets import SPADEGenerator  # noqa: E402
from vts_tpu.utils.convert_torch import (convert_global, convert_resnet,
                                         convert_spade)  # noqa: E402


def _check_tree_alignment(ref_tree, got_tree):
    ref_paths = {jax.tree_util.keystr(p): tuple(l.shape)
                 for p, l in jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
    got_paths = {jax.tree_util.keystr(p): tuple(np.asarray(l).shape)
                 for p, l in jax.tree_util.tree_flatten_with_path(got_tree)[0]}
    assert ref_paths == got_paths


def _conv_sd(sd, name, in_c, out_c, k, rng, bias=True):
    sd[f"{name}.weight"] = torch.from_numpy(
        rng.normal(0, 0.05, (out_c, in_c, k, k)).astype(np.float32))
    if bias:
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.normal(0, 0.02, (out_c,)).astype(np.float32))


def _convt_sd(sd, name, in_c, out_c, k, rng, bias=True):
    sd[f"{name}.weight"] = torch.from_numpy(
        rng.normal(0, 0.05, (in_c, out_c, k, k)).astype(np.float32))
    if bias:
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.normal(0, 0.02, (out_c,)).astype(np.float32))


def _blur_down_t(x):
    filt = binomial_filter_2d(3)
    c = x.shape[1]
    w = torch.from_numpy(np.tile(filt[None, None], (c, 1, 1, 1)).copy())
    return F.conv2d(F.pad(x, (1, 1, 1, 1), mode="reflect"), w, stride=2, groups=c)


def _blur_up_t(x):
    filt = binomial_filter_2d(4) * 4.0
    c = x.shape[1]
    w = torch.from_numpy(np.tile(filt[None, None], (c, 1, 1, 1)).copy())
    y = F.conv_transpose2d(F.pad(x, (1, 1, 1, 1), mode="replicate"), w,
                           stride=2, padding=2, groups=c)
    return y[:, :, 1:, 1:][:, :, :-1, :-1]


NGF, ND, NB, IN_NC, OUT_NC, SIZE = 4, 2, 2, 3, 3, 32


def _make_resnet_sd(rng, no_antialias, no_antialias_up):
    """Reference nn.Sequential index layout for ResnetGenerator."""
    sd = {}
    _conv_sd(sd, "model.1", IN_NC, NGF, 7, rng)
    per_down = 3 if no_antialias else 4
    for i in range(ND):
        _conv_sd(sd, f"model.{4 + per_down * i}", NGF * 2 ** i,
                 NGF * 2 ** (i + 1), 3, rng)
    s0 = 4 + per_down * ND
    dim = NGF * 2 ** ND
    for b in range(NB):
        _conv_sd(sd, f"model.{s0 + b}.conv_block.1", dim, dim, 3, rng)
        _conv_sd(sd, f"model.{s0 + b}.conv_block.5", dim, dim, 3, rng)
    s1 = s0 + NB
    for i in range(ND):
        mult = 2 ** (ND - i)
        if no_antialias_up:
            _convt_sd(sd, f"model.{s1 + 3 * i}", NGF * mult,
                      NGF * mult // 2, 3, rng)
        else:
            _conv_sd(sd, f"model.{s1 + 4 * i + 1}", NGF * mult,
                     NGF * mult // 2, 3, rng)
    per_up = 3 if no_antialias_up else 4
    _conv_sd(sd, f"model.{s1 + per_up * ND + 1}", NGF, OUT_NC, 7, rng)
    return sd


def _resnet_torch_forward(sd, x, no_antialias, no_antialias_up):
    inorm = lambda t: F.instance_norm(t)
    h = F.pad(x, (3, 3, 3, 3), mode="reflect")
    h = F.conv2d(h, sd["model.1.weight"], sd["model.1.bias"])
    h = F.relu(inorm(h))
    per_down = 3 if no_antialias else 4
    for i in range(ND):
        idx = 4 + per_down * i
        h = F.conv2d(h, sd[f"model.{idx}.weight"], sd[f"model.{idx}.bias"],
                     stride=2 if no_antialias else 1, padding=1)
        h = F.relu(inorm(h))
        if not no_antialias:
            h = _blur_down_t(h)
    s0 = 4 + per_down * ND
    for b in range(NB):
        y = F.pad(h, (1, 1, 1, 1), mode="reflect")
        y = F.conv2d(y, sd[f"model.{s0 + b}.conv_block.1.weight"],
                     sd[f"model.{s0 + b}.conv_block.1.bias"])
        y = F.relu(inorm(y))
        y = F.pad(y, (1, 1, 1, 1), mode="reflect")
        y = F.conv2d(y, sd[f"model.{s0 + b}.conv_block.5.weight"],
                     sd[f"model.{s0 + b}.conv_block.5.bias"])
        h = h + inorm(y)
    s1 = s0 + NB
    for i in range(ND):
        if no_antialias_up:
            idx = s1 + 3 * i
            h = F.conv_transpose2d(h, sd[f"model.{idx}.weight"],
                                   sd[f"model.{idx}.bias"], stride=2,
                                   padding=1, output_padding=1)
        else:
            idx = s1 + 4 * i + 1
            h = _blur_up_t(h)
            h = F.conv2d(h, sd[f"model.{idx}.weight"], sd[f"model.{idx}.bias"],
                         padding=1)
        h = F.relu(inorm(h))
    per_up = 3 if no_antialias_up else 4
    idx = s1 + per_up * ND + 1
    h = F.pad(h, (3, 3, 3, 3), mode="reflect")
    return torch.tanh(F.conv2d(h, sd[f"model.{idx}.weight"], sd[f"model.{idx}.bias"]))


@pytest.mark.parametrize("no_aa,no_aa_up", [(False, False), (True, True)])
def test_resnet_converted_matches_torch(no_aa, no_aa_up):
    rng = np.random.default_rng(10)
    sd = _make_resnet_sd(rng, no_aa, no_aa_up)
    x = rng.uniform(-1, 1, (1, SIZE, SIZE, IN_NC)).astype(np.float32)
    y_t = _resnet_torch_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
                                no_aa, no_aa_up)
    y_t = y_t.detach().numpy().transpose(0, 2, 3, 1)

    params = convert_resnet(sd, n_blocks=NB, n_downsampling=ND,
                            no_antialias=no_aa, no_antialias_up=no_aa_up)
    net = ResnetGenerator(ngf=NGF, out_nc=OUT_NC, n_blocks=NB, n_downsampling=ND,
                          norm_type="instance", no_antialias=no_aa,
                          no_antialias_up=no_aa_up)
    ref = net.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_tree_alignment(ref, params)
    y_j = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=2e-4)


def test_global_converted_matches_torch():
    rng = np.random.default_rng(11)
    sd = {}
    _conv_sd(sd, "model.1", IN_NC, NGF, 7, rng)
    for i in range(ND):
        _conv_sd(sd, f"model.{4 + 3 * i}", NGF * 2 ** i, NGF * 2 ** (i + 1), 3, rng)
    s0 = 4 + 3 * ND
    dim = NGF * 2 ** ND
    for b in range(NB):
        _conv_sd(sd, f"model.{s0 + b}.conv_block.1", dim, dim, 3, rng)
        _conv_sd(sd, f"model.{s0 + b}.conv_block.5", dim, dim, 3, rng)
    s1 = s0 + NB
    for i in range(ND):
        mult = 2 ** (ND - i)
        _convt_sd(sd, f"model.{s1 + 3 * i}", NGF * mult, NGF * mult // 2, 3, rng)
    _conv_sd(sd, f"model.{s1 + 3 * ND + 1}", NGF, OUT_NC, 7, rng)

    x = rng.uniform(-1, 1, (1, SIZE, SIZE, IN_NC)).astype(np.float32)

    # torch forward (GlobalGenerator: stride-2 down convs, ConvT k3s2p1op1 up)
    inorm = lambda t: F.instance_norm(t)
    h = F.pad(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
              (3, 3, 3, 3), mode="reflect")
    h = F.relu(inorm(F.conv2d(h, sd["model.1.weight"], sd["model.1.bias"])))
    for i in range(ND):
        idx = 4 + 3 * i
        h = F.relu(inorm(F.conv2d(h, sd[f"model.{idx}.weight"],
                                  sd[f"model.{idx}.bias"], stride=2, padding=1)))
    for b in range(NB):
        y = F.pad(h, (1, 1, 1, 1), mode="reflect")
        y = F.relu(inorm(F.conv2d(y, sd[f"model.{s0 + b}.conv_block.1.weight"],
                                  sd[f"model.{s0 + b}.conv_block.1.bias"])))
        y = F.pad(y, (1, 1, 1, 1), mode="reflect")
        y = inorm(F.conv2d(y, sd[f"model.{s0 + b}.conv_block.5.weight"],
                           sd[f"model.{s0 + b}.conv_block.5.bias"]))
        h = h + y
    for i in range(ND):
        idx = s1 + 3 * i
        h = F.relu(inorm(F.conv_transpose2d(h, sd[f"model.{idx}.weight"],
                                            sd[f"model.{idx}.bias"], stride=2,
                                            padding=1, output_padding=1)))
    idx = s1 + 3 * ND + 1
    h = F.pad(h, (3, 3, 3, 3), mode="reflect")
    y_t = torch.tanh(F.conv2d(h, sd[f"model.{idx}.weight"], sd[f"model.{idx}.bias"]))
    y_t = y_t.detach().numpy().transpose(0, 2, 3, 1)

    params = convert_global(sd, n_downsampling=ND, n_blocks=NB)
    net = GlobalGenerator(ngf=NGF, out_nc=OUT_NC, n_downsampling=ND,
                          n_blocks=NB, norm_type="instance")
    ref = net.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_tree_alignment(ref, params)
    y_j = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# SPADE: torch module tree rebuilt from public API (spectral_norm + BatchNorm)
# ---------------------------------------------------------------------------

class _TSPADENorm(tnn.Module):
    def __init__(self, nc, label_nc, ks=3):
        super().__init__()
        self.param_free_norm = tnn.BatchNorm2d(nc, affine=False)
        self.mlp_shared = tnn.Sequential(
            tnn.Conv2d(label_nc, 128, ks, padding=ks // 2), tnn.ReLU())
        self.mlp_gamma = tnn.Conv2d(128, nc, ks, padding=ks // 2)
        self.mlp_beta = tnn.Conv2d(128, nc, ks, padding=ks // 2)

    def forward(self, x, seg):
        n = self.param_free_norm(x)
        seg = F.interpolate(seg, size=x.shape[2:])
        a = self.mlp_shared(seg)
        return n * (1 + self.mlp_gamma(a)) + self.mlp_beta(a)


class _TSPADEBlock(tnn.Module):
    def __init__(self, fin, fout, label_nc):
        super().__init__()
        sn = tnn.utils.spectral_norm
        fmid = min(fin, fout)
        self.learned_shortcut = fin != fout
        self.conv_0 = sn(tnn.Conv2d(fin, fmid, 3, padding=1))
        self.conv_1 = sn(tnn.Conv2d(fmid, fout, 3, padding=1))
        self.norm_0 = _TSPADENorm(fin, label_nc)
        self.norm_1 = _TSPADENorm(fmid, label_nc)
        if self.learned_shortcut:
            self.conv_s = sn(tnn.Conv2d(fin, fout, 1, bias=False))
            self.norm_s = _TSPADENorm(fin, label_nc)

    def forward(self, x, seg):
        x_s = self.conv_s(self.norm_s(x, seg)) if self.learned_shortcut else x
        dx = self.conv_0(F.leaky_relu(self.norm_0(x, seg), 0.2))
        dx = self.conv_1(F.leaky_relu(self.norm_1(dx, seg), 0.2))
        return x_s + dx


class _TSPADEGen(tnn.Module):
    def __init__(self, nf, label_nc, out_nc, n_up=3, sw=4):
        super().__init__()
        self.sw = sw
        self.fc = tnn.Conv2d(label_nc, 16 * nf, 3, padding=1)
        self.head_0 = _TSPADEBlock(16 * nf, 16 * nf, label_nc)
        self.G_middle_0 = _TSPADEBlock(16 * nf, 16 * nf, label_nc)
        self.G_middle_1 = _TSPADEBlock(16 * nf, 16 * nf, label_nc)
        self.up_0 = _TSPADEBlock(16 * nf, 8 * nf, label_nc)
        self.up_1 = _TSPADEBlock(8 * nf, 4 * nf, label_nc)
        self.conv_img = tnn.Conv2d(4 * nf, out_nc, 3, padding=1)
        self.up = tnn.Upsample(scale_factor=2)

    def forward(self, seg):
        x = F.interpolate(seg, size=(self.sw, self.sw))
        x = self.fc(x)
        x = self.head_0(x, seg)
        x = self.up(x)
        x = self.G_middle_0(x, seg)
        x = self.G_middle_1(x, seg)
        x = self.up(x)
        x = self.up_0(x, seg)
        x = self.up(x)
        x = self.up_1(x, seg)
        return torch.tanh(self.conv_img(F.leaky_relu(x, 0.2)))


def test_spade_converted_matches_torch():
    """Train-mode forward parity: torch spectral_norm power-iterates from the
    stored u exactly like our SpectralConv (sigma is basis-independent over
    the flattened axis), and batch-mode BatchNorm matches flax's."""
    torch.manual_seed(0)
    nf, label_nc, out_nc, n_up = 2, 1, 5, 3
    tnet = _TSPADEGen(nf, label_nc, out_nc, n_up=n_up)
    tnet.train()
    rng = np.random.default_rng(12)
    seg = rng.uniform(0, 1, (1, 32, 32, label_nc)).astype(np.float32)
    seg_t = torch.from_numpy(seg.transpose(0, 3, 1, 2).copy())
    # snapshot BEFORE the forward: train-mode spectral_norm power-iterates u
    # in place, and both sides must start from the same stored u
    sd = {k: v.clone() for k, v in tnet.state_dict().items()}
    with torch.no_grad():
        y_t = tnet(seg_t).numpy().transpose(0, 2, 3, 1)
    params, stats = convert_spade(sd, num_upsampling_layers=n_up)

    net = SPADEGenerator(ngf=nf, out_nc=out_nc, semantic_nc=label_nc,
                         num_upsampling_layers=n_up, crop_size=32,
                         norm_g="spectralspadesyncbatch3x3", train=True)
    variables = net.init(jax.random.key(0), jnp.asarray(seg))
    _check_tree_alignment(variables["params"], params)
    _check_tree_alignment(variables["batch_stats"], stats)
    y_j, _ = net.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(seg), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-3, atol=5e-4)


def test_local_converted_matches_torch():
    """pix2pixHD LocalEnhancer (reference networks.py:1897-1950): global core
    on the ×2-downsampled pyramid + one enhancer level, converted."""
    rng = np.random.default_rng(13)
    ngf, ndg, nbg, nbl, in_nc, out_nc = 2, 2, 2, 2, 3, 3
    g1 = ngf * 2  # global core width for n_local_enhancers=1
    sd = {}
    # global core (GlobalGenerator.model minus final pad/conv/tanh)
    _conv_sd(sd, "model.1", in_nc, g1, 7, rng)
    for i in range(ndg):
        _conv_sd(sd, f"model.{4 + 3 * i}", g1 * 2 ** i, g1 * 2 ** (i + 1), 3, rng)
    s0 = 4 + 3 * ndg
    dim = g1 * 2 ** ndg
    for b in range(nbg):
        _conv_sd(sd, f"model.{s0 + b}.conv_block.1", dim, dim, 3, rng)
        _conv_sd(sd, f"model.{s0 + b}.conv_block.5", dim, dim, 3, rng)
    s1 = s0 + nbg
    for i in range(ndg):
        mult = 2 ** (ndg - i)
        _convt_sd(sd, f"model.{s1 + 3 * i}", g1 * mult, g1 * mult // 2, 3, rng)
    # enhancer level 1
    _conv_sd(sd, "model1_1.1", in_nc, ngf, 7, rng)
    _conv_sd(sd, "model1_1.4", ngf, ngf * 2, 3, rng)
    for b in range(nbl):
        _conv_sd(sd, f"model1_2.{b}.conv_block.1", ngf * 2, ngf * 2, 3, rng)
        _conv_sd(sd, f"model1_2.{b}.conv_block.5", ngf * 2, ngf * 2, 3, rng)
    _convt_sd(sd, f"model1_2.{nbl}", ngf * 2, ngf, 3, rng)
    _conv_sd(sd, f"model1_2.{nbl + 4}", ngf, out_nc, 7, rng)

    x = rng.uniform(-1, 1, (1, 64, 64, in_nc)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    inorm = lambda t: F.instance_norm(t)

    def core_fwd(h):
        h = F.pad(h, (3, 3, 3, 3), mode="reflect")
        h = F.relu(inorm(F.conv2d(h, sd["model.1.weight"], sd["model.1.bias"])))
        for i in range(ndg):
            idx = 4 + 3 * i
            h = F.relu(inorm(F.conv2d(h, sd[f"model.{idx}.weight"],
                                      sd[f"model.{idx}.bias"], stride=2, padding=1)))
        for b in range(nbg):
            y = F.pad(h, (1, 1, 1, 1), mode="reflect")
            y = F.relu(inorm(F.conv2d(y, sd[f"model.{s0+b}.conv_block.1.weight"],
                                      sd[f"model.{s0+b}.conv_block.1.bias"])))
            y = F.pad(y, (1, 1, 1, 1), mode="reflect")
            y = inorm(F.conv2d(y, sd[f"model.{s0+b}.conv_block.5.weight"],
                               sd[f"model.{s0+b}.conv_block.5.bias"]))
            h = h + y
        for i in range(ndg):
            idx = s1 + 3 * i
            h = F.relu(inorm(F.conv_transpose2d(h, sd[f"model.{idx}.weight"],
                                                sd[f"model.{idx}.bias"], stride=2,
                                                padding=1, output_padding=1)))
        return h

    down = F.avg_pool2d(xt, 3, stride=2, padding=1, count_include_pad=False)
    out_prev = core_fwd(down)
    h = F.pad(xt, (3, 3, 3, 3), mode="reflect")
    h = F.relu(inorm(F.conv2d(h, sd["model1_1.1.weight"], sd["model1_1.1.bias"])))
    h = F.relu(inorm(F.conv2d(h, sd["model1_1.4.weight"], sd["model1_1.4.bias"],
                              stride=2, padding=1)))
    h = h + out_prev
    for b in range(nbl):
        y = F.pad(h, (1, 1, 1, 1), mode="reflect")
        y = F.relu(inorm(F.conv2d(y, sd[f"model1_2.{b}.conv_block.1.weight"],
                                  sd[f"model1_2.{b}.conv_block.1.bias"])))
        y = F.pad(y, (1, 1, 1, 1), mode="reflect")
        y = inorm(F.conv2d(y, sd[f"model1_2.{b}.conv_block.5.weight"],
                           sd[f"model1_2.{b}.conv_block.5.bias"]))
        h = h + y
    h = F.relu(inorm(F.conv_transpose2d(h, sd[f"model1_2.{nbl}.weight"],
                                        sd[f"model1_2.{nbl}.bias"], stride=2,
                                        padding=1, output_padding=1)))
    h = F.pad(h, (3, 3, 3, 3), mode="reflect")
    y_t = torch.tanh(F.conv2d(h, sd[f"model1_2.{nbl+4}.weight"],
                              sd[f"model1_2.{nbl+4}.bias"]))
    y_t = y_t.detach().numpy().transpose(0, 2, 3, 1)

    from vts_tpu.networks.pix2pixhd_nets import LocalEnhancer
    from vts_tpu.utils.convert_torch import convert_local
    params = convert_local(sd, n_local_enhancers=1, n_downsample_global=ndg,
                           n_blocks_global=nbg, n_blocks_local=nbl)
    net = LocalEnhancer(ngf=ngf, out_nc=out_nc, n_downsample_global=ndg,
                        n_blocks_global=nbg, n_local_enhancers=1,
                        n_blocks_local=nbl, norm_type="instance")
    ref = net.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_tree_alignment(ref, params)
    y_j = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=2e-4)


def test_encoder_converted_matches_torch():
    """pix2pixHD instance-feature Encoder (reference networks.py:1986-2019)."""
    rng = np.random.default_rng(14)
    ngf, nd, in_nc, out_nc = 2, 2, 3, 3
    sd = {}
    _conv_sd(sd, "model.1", in_nc, ngf, 7, rng)
    for i in range(nd):
        _conv_sd(sd, f"model.{4 + 3 * i}", ngf * 2 ** i, ngf * 2 ** (i + 1), 3, rng)
    s1 = 4 + 3 * nd
    for i in range(nd):
        mult = 2 ** (nd - i)
        _convt_sd(sd, f"model.{s1 + 3 * i}", ngf * mult, ngf * mult // 2, 3, rng)
    _conv_sd(sd, f"model.{s1 + 3 * nd + 1}", ngf, out_nc, 7, rng)

    x = rng.uniform(-1, 1, (1, 32, 32, in_nc)).astype(np.float32)
    inorm = lambda t: F.instance_norm(t)
    h = F.pad(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
              (3, 3, 3, 3), mode="reflect")
    h = F.relu(inorm(F.conv2d(h, sd["model.1.weight"], sd["model.1.bias"])))
    for i in range(nd):
        idx = 4 + 3 * i
        h = F.relu(inorm(F.conv2d(h, sd[f"model.{idx}.weight"],
                                  sd[f"model.{idx}.bias"], stride=2, padding=1)))
    for i in range(nd):
        idx = s1 + 3 * i
        h = F.relu(inorm(F.conv_transpose2d(h, sd[f"model.{idx}.weight"],
                                            sd[f"model.{idx}.bias"], stride=2,
                                            padding=1, output_padding=1)))
    idx = s1 + 3 * nd + 1
    h = F.pad(h, (3, 3, 3, 3), mode="reflect")
    y_t = torch.tanh(F.conv2d(h, sd[f"model.{idx}.weight"], sd[f"model.{idx}.bias"]))
    y_t = y_t.detach().numpy().transpose(0, 2, 3, 1)

    from vts_tpu.networks.pix2pixhd_nets import Encoder
    from vts_tpu.utils.convert_torch import convert_encoder
    params = convert_encoder(sd, n_downsampling=nd)
    net = Encoder(ngf=ngf, out_nc=out_nc, n_downsampling=nd, norm_type="instance")
    ref = net.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_tree_alignment(ref, params)
    y_j = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=2e-4)


def test_converted_checkpoint_loads_into_model(tmp_path):
    """End-to-end migration: reference-format .pth → convert_torch CLI →
    msgpack → sinskit load_networks('best') → eval forward uses the
    converted weights (the README 'Migrating from the reference' journey)."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from test_convert import make_reference_state_dict, ND, SEP, IN_NC
    from test_models import tiny_opt, synth_batch
    from vts_tpu.models.sinskit import SinSKITModel
    from vts_tpu.utils.convert_torch import main as convert_main

    rng = np.random.default_rng(20)
    sd = make_reference_state_dict(rng)     # ngf=4, 8 downs, sep 4
    torch.save(sd, str(tmp_path / "best_net_G.pth"))
    ck = tmp_path / "mig" / "exp"
    convert_main(["--input", str(tmp_path / "best_net_G.pth"),
                  "--output", str(ck / "best_net_G.msgpack"),
                  "--arch", "unet256_custom"])

    opt = tiny_opt(ngf=4, isTrain=False, checkpoints_dir=str(tmp_path / "mig"),
                   name="exp", use_positional_encoding=False, sketch_nc=9)
    model = SinSKITModel(opt)
    batch = synth_batch()
    batch["S"] = rng.uniform(-1, 1, (1, 256, 256, IN_NC)).astype(np.float32)
    model.setup(batch)
    before = np.asarray(jax.tree_util.tree_leaves(model.states["G"].params)[0])
    model.load_networks("best")
    after = np.asarray(jax.tree_util.tree_leaves(model.states["G"].params)[0])
    assert np.abs(before - after).max() > 0, "converted weights not loaded"
    model.set_input(batch, phase="test")
    model.test()
    fake_I = np.asarray(model._outputs["fake_I"])
    assert fake_I.shape == (1, 256, 256, 3)
    assert np.isfinite(fake_I).all() and np.abs(fake_I).max() <= 1.0


def test_spade_vae_fc_converted_matches_torch():
    """VAE-mode SPADE fc: torch flattens (C,H,W), ours (H,W,C) — the
    converter permutes the Dense axes; full forward must agree."""
    torch.manual_seed(1)
    nf, label_nc, out_nc, n_up, z_dim = 2, 1, 5, 3, 8

    class _TVae(_TSPADEGen):
        def __init__(self):
            super().__init__(nf, label_nc, out_nc, n_up=n_up, sw=4)
            self.fc = tnn.Linear(z_dim, 16 * nf * 4 * 4)

        def forward(self, seg, z):
            x = self.fc(z).view(-1, 16 * nf, 4, 4)
            x = self.head_0(x, seg)
            x = self.up(x)
            x = self.G_middle_0(x, seg)
            x = self.G_middle_1(x, seg)
            x = self.up(x)
            x = self.up_0(x, seg)
            x = self.up(x)
            x = self.up_1(x, seg)
            return torch.tanh(self.conv_img(F.leaky_relu(x, 0.2)))

    tnet = _TVae()
    tnet.train()
    rng = np.random.default_rng(15)
    seg = rng.uniform(0, 1, (1, 32, 32, label_nc)).astype(np.float32)
    z = rng.normal(size=(1, z_dim)).astype(np.float32)
    sd = {k: v.clone() for k, v in tnet.state_dict().items()}
    with torch.no_grad():
        y_t = tnet(torch.from_numpy(seg.transpose(0, 3, 1, 2).copy()),
                   torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)

    params, stats = convert_spade(sd, num_upsampling_layers=n_up,
                                  use_vae=True, ngf=nf, sh=4, sw=4)
    net = SPADEGenerator(ngf=nf, out_nc=out_nc, semantic_nc=label_nc,
                         num_upsampling_layers=n_up, crop_size=32,
                         use_vae=True, z_dim=z_dim,
                         norm_g="spectralspadesyncbatch3x3", train=True)
    variables = net.init(jax.random.key(0), jnp.asarray(seg), jnp.asarray(z))
    _check_tree_alignment(variables["params"], params)
    y_j, _ = net.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(seg), jnp.asarray(z), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-3, atol=5e-4)
