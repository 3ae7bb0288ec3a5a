"""Shape-golden tests for the network zoo, against the reference's documented
traces (reference models/networks.py:1540-1573 for the U-Net; discriminator
output sizes from the k4/p2 PatchGAN arithmetic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vts_tpu.networks.discriminators import (MultiscaleDiscriminator,
                                             NLayerDiscriminator,
                                             PatchDiscriminator,
                                             PixelDiscriminator)
from vts_tpu.networks.positional import csg_grid, positional_encoding, spe_grid
from vts_tpu.networks.unet_custom import CustomUNet


SIZE = 256  # scaled-down stand-in for 1536 (same num_downs → 1x1 latent at 256)


def test_custom_unet_shapes_and_branches():
    net = CustomUNet(ngf=4, num_downs=8, num_layer_separate=4, input_size=SIZE)
    x = jnp.zeros((1, SIZE, SIZE, 9))
    params = net.init(jax.random.key(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, SIZE, SIZE, 5)
    # tanh bounds both heads
    assert float(jnp.max(jnp.abs(y))) <= 1.0
    # tactile branch params exist exactly for the top 4 decoder levels
    names = set(params["params"].keys())
    for i in range(4):
        assert f"up{i}_T" in names, names
    for i in range(4, 8):
        assert f"up{i}_T" not in names


@pytest.mark.slow
def test_custom_unet_channel_trace():
    """Check the documented encoder trace: 10→20→40→80→80… at halving sizes
    (reference models/networks.py:1540-1573, ngf=10)."""
    net = CustomUNet(ngf=10, num_downs=8, num_layer_separate=4, input_size=SIZE)
    x = jnp.zeros((1, SIZE, SIZE, 9))
    params = net.init(jax.random.key(0), x)
    p = params["params"]
    # down0 conv kernel: (4,4,9,10); down3: (4,4,40,80); down7: (4,4,80,80)
    assert p["down0"]["Conv4x4_0"]["Conv_0"]["kernel"].shape == (4, 4, 9, 10)
    assert p["down3"]["Conv4x4_0"]["Conv_0"]["kernel"].shape == (4, 4, 40, 80)
    assert p["down7"]["Conv4x4_0"]["Conv_0"]["kernel"].shape == (4, 4, 80, 80)
    # up7 innermost: convT(80→80); up6: convT(160→80); up3: convT(160→40)
    assert p["up7"]["ConvT4x4_0"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 80, 80)
    assert p["up6"]["ConvT4x4_0"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 160, 80)
    assert p["up3"]["ConvT4x4_0"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 160, 40)
    # up1: convT(40→10); outermost heads: visual convT(10→3), tactile convT(10→2)
    assert p["up1"]["ConvT4x4_0"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 40, 10)
    assert p["up0"]["ConvT4x4_0"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 10, 3)
    assert p["up0_T"]["ConvT4x4_0"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 10, 2)


def test_custom_unet_style_code_concat():
    net = CustomUNet(ngf=4, num_downs=8, num_layer_separate=4, input_size=SIZE,
                     use_style_code=True, style_code_dim=16,
                     style_code_mapping_mode="tile", style_code_mode="concat",
                     num_layer_style_code=2)
    x = jnp.zeros((1, SIZE, SIZE, 9))
    style = jnp.ones((1, 16))
    params = net.init(jax.random.key(0), x, style)
    y = net.apply(params, x, style)
    assert y.shape == (1, SIZE, SIZE, 5)


def test_custom_unet_style_code_adain_project():
    net = CustomUNet(ngf=4, num_downs=8, num_layer_separate=4, input_size=SIZE,
                     use_style_code=True, style_code_dim=16,
                     style_code_mapping_mode="project", style_code_mode="adain",
                     num_layer_style_code=3)
    x = jnp.zeros((1, SIZE, SIZE, 9))
    style = jnp.ones((1, 16))
    params = net.init(jax.random.key(0), x, style)
    y = net.apply(params, x, style)
    assert y.shape == (1, SIZE, SIZE, 5)


def test_nlayer_discriminator_shapes():
    d = NLayerDiscriminator(ndf=8, n_layers=3, norm_type="batch", train=False)
    x = jnp.zeros((2, 256, 256, 4))
    params = d.init(jax.random.key(0), x)
    y = d.apply(params, x)
    # 256 -(s2p2)-> 129 -> 65 -> 33 -(s1p2)-> 34 -> 35
    assert y.shape == (2, 35, 35, 1)
    feats = NLayerDiscriminator(ndf=8, n_layers=3, norm_type="batch", train=False,
                                get_interm_feat=True).apply(params, x)
    assert len(feats) == 5  # n_layers + 2
    assert feats[-1].shape == (2, 35, 35, 1)
    assert feats[0].shape == (2, 129, 129, 8)


def test_multiscale_discriminator_pyramid():
    d = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=3, norm_type="batch", train=False)
    x = jnp.zeros((1, 256, 256, 4))
    params = d.init(jax.random.key(0), x)
    outs = d.apply(params, x)
    assert len(outs) == 3
    # scale 0 sees full res; scales 1,2 see /2 and /4 pyramids
    assert outs[0][-1].shape[1] == 35
    assert outs[1][-1].shape[1] < outs[0][-1].shape[1]
    assert outs[2][-1].shape[1] < outs[1][-1].shape[1]


def test_multiscale_small_patch_input():
    # D2 runs on 32x32 SIMT patches with 7 channels (2T+1S+3I+1mask)
    d = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=3, norm_type="batch", train=False)
    x = jnp.zeros((64, 32, 32, 7))
    params = d.init(jax.random.key(0), x)
    outs = d.apply(params, x)
    assert len(outs) == 3 and outs[0][-1].shape[0] == 64


def test_pixel_and_patch_discriminators():
    x = jnp.zeros((2, 64, 64, 3))
    d = PixelDiscriminator(ndf=8, train=False)
    p = d.init(jax.random.key(0), x)
    assert d.apply(p, x).shape == (2, 64, 64, 1)
    d2 = PatchDiscriminator(ndf=8, train=False)
    p2 = d2.init(jax.random.key(0), x)
    y = d2.apply(p2, x)
    assert y.shape[0] == 2 * 4 * 4  # 16x16 tiles


# ---------------------------------------------------------------------------
# positional encodings — value parity with the reference math
# ---------------------------------------------------------------------------

def test_spe_matches_reference_math():
    h = w = 8
    dim = 4
    g = np.asarray(spe_grid(h, w, dim))
    assert g.shape == (h, w, 2 * dim)
    # x-embedding at column j is emb(j+1); y-embedding at row i is emb(i+1)
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(np.log(1e4) / (half - 1)))
    for j in [0, 3, 7]:
        p = j + 1
        expect = np.concatenate([np.sin(p * freqs), np.cos(p * freqs)])
        np.testing.assert_allclose(g[0, j, :dim], expect, rtol=1e-5)
    for i in [0, 5]:
        p = i + 1
        expect = np.concatenate([np.sin(p * freqs), np.cos(p * freqs)])
        np.testing.assert_allclose(g[i, 0, dim:], expect, rtol=1e-5)
    # x-embedding constant along rows, y constant along columns
    assert np.allclose(g[:, 2, :dim], g[0, 2, :dim])
    assert np.allclose(g[2, :, dim:], g[2, 0, dim:])


def test_csg_matches_reference_math():
    g = np.asarray(csg_grid(4, 6))
    assert g.shape == (4, 6, 2)
    np.testing.assert_allclose(g[0, 0], [-1.0, -1.0])
    np.testing.assert_allclose(g[-1, -1], [1.0, 1.0])
    # channel 0 is x (varies along width), channel 1 is y
    assert np.allclose(g[0, :, 0], np.linspace(-1, 1, 6))
    assert np.allclose(g[:, 0, 1], np.linspace(-1, 1, 4))


def test_positional_encoding_batched():
    pe = positional_encoding(16, 16, mode="spe", dim=4, batch=2)
    assert pe.shape == (2, 16, 16, 8)
    pe2 = positional_encoding(16, 16, mode="csg", batch=3)
    assert pe2.shape == (3, 16, 16, 2)
