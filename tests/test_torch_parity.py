"""Numerical parity vs torch's own public ops (torch CPU is available).

These pin down (a) op semantics (conv/transposed-conv/pool/norm padding and
stride conventions) and (b) the weight-layout mapping the checkpoint
converters rely on.  The torch side is built from torch's public API only.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vts_tpu.networks.blocks import (InstanceNorm, avg_pool_3x3_s2_nopad_count,
                                     binomial_filter_2d, blur_downsample,
                                     blur_upsample)  # noqa: E402
from vts_tpu.losses.gan import gan_loss  # noqa: E402
from vts_tpu.losses.lpips import init_lpips_params, vgg16_taps, _VGG16_PLAN  # noqa: E402


def _to_torch_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


def _from_torch_nchw(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def test_conv4x4_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    w = rng.normal(size=(4, 4, 3, 5)).astype(np.float32)  # HWIO
    y_jax = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # torch Conv2d weight is OIHW
    y_t = F.conv2d(_to_torch_nchw(x), torch.from_numpy(w.transpose(3, 2, 0, 1).copy()),
                   stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(y_jax), y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose_4x4_matches_torch():
    """flax ConvTranspose(k4,s2,pad2) ≡ torch ConvTranspose2d(k4,s2,p1) with
    weight mapping: torch (in,out,kh,kw) → flax HWIO spatially FLIPPED."""
    from flax import linen as nn
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    w_t = rng.normal(size=(3, 5, 4, 4)).astype(np.float32)  # (in,out,kh,kw)
    y_t = F.conv_transpose2d(_to_torch_nchw(x), torch.from_numpy(w_t),
                             stride=2, padding=1)
    # candidate flax kernel: flip spatial, put HWIO
    w_j = w_t.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    m = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                         use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w_j)}}
    y_j = m.apply(params, jnp.asarray(x))
    assert y_j.shape == (1, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(y_j),
                               y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_blur_downsample_matches_torch_reference_semantics():
    """pad-reflect + depthwise binomial FIR + stride 2 (the antialiased
    Downsample, reference models/networks.py:50-74)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 12, 12, 4)).astype(np.float32)
    y_j = blur_downsample(jnp.asarray(x), filt_size=3, stride=2)
    filt = binomial_filter_2d(3)
    xt = _to_torch_nchw(x)
    xt = F.pad(xt, (1, 1, 1, 1), mode="reflect")
    wt = torch.from_numpy(np.tile(filt[None, None], (4, 1, 1, 1)).copy())
    y_t = F.conv2d(xt, wt, stride=2, groups=4)
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_blur_upsample_matches_torch_reference_semantics():
    """repl-pad + conv_transpose FIR×4 + crop (reference networks.py:87-107)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    y_j = blur_upsample(jnp.asarray(x), filt_size=4, stride=2)
    filt = binomial_filter_2d(4) * 4.0
    xt = _to_torch_nchw(x)
    xt = F.pad(xt, (1, 1, 1, 1), mode="replicate")
    wt = torch.from_numpy(np.tile(filt[None, None], (2, 1, 1, 1)).copy())
    y_t = F.conv_transpose2d(xt, wt, stride=2, padding=1 + 1, groups=2)
    y_t = y_t[:, :, 1:, 1:][:, :, :-1, :-1]
    assert y_j.shape == (1, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_avg_pool_count_exclude_pad_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)
    y_j = avg_pool_3x3_s2_nopad_count(jnp.asarray(x))
    y_t = F.avg_pool2d(_to_torch_nchw(x), 3, stride=2, padding=1,
                       count_include_pad=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    m = InstanceNorm()
    y_j = m.apply({}, jnp.asarray(x))
    y_t = F.instance_norm(_to_torch_nchw(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_gan_losses_match_torch_criteria():
    rng = np.random.default_rng(6)
    pred = rng.normal(size=(4, 1, 5, 5)).astype(np.float32)
    pred_j = jnp.asarray(pred.transpose(0, 2, 3, 1))
    pt = torch.from_numpy(pred)
    # lsgan == MSE vs target
    want = F.mse_loss(pt, torch.full_like(pt, 0.8)).item()
    assert float(gan_loss(pred_j, True, "lsgan", real_label=0.8)) == pytest.approx(want, rel=1e-5)
    # vanilla == BCEWithLogits
    want = F.binary_cross_entropy_with_logits(pt, torch.ones_like(pt)).item()
    assert float(gan_loss(pred_j, True, "vanilla")) == pytest.approx(want, rel=1e-5)
    # nonsaturating == softplus(-x).view(bs,-1).mean(1)
    want = F.softplus(-pt).view(4, -1).mean(dim=1).numpy()
    got = np.asarray(gan_loss(pred_j, True, "nonsaturating"))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # hinge == relu(1-x).view(bs,-1).mean(1)
    want = F.relu(1 - pt).view(4, -1).mean(dim=1).numpy()
    np.testing.assert_allclose(np.asarray(gan_loss(pred_j, True, "hinge")), want,
                               rtol=1e-5)


def test_vgg16_backbone_matches_torch_with_same_weights():
    """Build torch VGG16-features from our param pytree and compare the 5 tap
    activations — validates the conv plan, pad/pool placement, and the
    HWIO↔OIHW layout the LPIPS weight converter uses."""
    params = init_lpips_params(0)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)

    taps_j = [np.asarray(t) for t in vgg16_taps(params, jnp.asarray(x))]

    h = _to_torch_nchw(x)
    taps_t = []
    for i, ((out_c, pool), p) in enumerate(zip(_VGG16_PLAN, params["conv"])):
        w = torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(p["b"]))
        h = F.relu(F.conv2d(h, w, b, padding=1))
        if i in (1, 3, 6, 9, 12):
            taps_t.append(h.detach().numpy().transpose(0, 2, 3, 1))
        if pool and i != len(_VGG16_PLAN) - 1:
            h = F.max_pool2d(h, 2, 2)
    assert len(taps_j) == len(taps_t) == 5
    for a, b in zip(taps_j, taps_t):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
