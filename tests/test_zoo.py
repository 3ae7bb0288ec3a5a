"""Factory-coverage test: every define_G / define_D path constructs and runs."""

import types

import jax
import jax.numpy as jnp
import pytest

from vts_tpu.networks import define_D, define_G


def zoo_opt(**kw):
    base = dict(
        netG="resnet_9blocks", netD="basic", ngf=8, ndf=8, n_layers_D=3,
        normG="instance", normD="instance", init_type="xavier", init_gain=0.02,
        no_dropout=True, no_antialias=False, no_antialias_up=False,
        gan_mode="lsgan", crop_size=64, load_size=64,
        T_resolution_multiplier=1, num_layer_separate=0, getIntermFeat_D=False,
        n_downsample_global=2, n_blocks_global=2, n_local_enhancers=1,
        n_blocks_local=1, num_upsampling_layers=3, output_width=64,
        aspect_ratio=1.0, use_vae=False, z_dim=16, nz=8,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.mark.parametrize("name,out_nc,in_nc", [
    ("resnet_9blocks", 3, 1),
    ("resnet_6blocks", 5, 1),
    ("resnet_4blocks", 3, 3),
    ("unet_128", 3, 1),
    ("global", 5, 1),
    ("encoder", 3, 3),
    ("resnet_cat", 3, 3),
    ("visgel", 2, 3),
])
def test_generators_construct_and_run(name, out_nc, in_nc):
    opt = zoo_opt(netG=name)
    g = define_G(opt, in_nc, out_nc, train=False)
    size = 32 if name == "visgel" else 64
    x = jnp.zeros((1, size, size, in_nc))
    variables = g.init(jax.random.key(0), x)
    y = g.apply(variables, x)
    assert y.shape[0] == 1 and y.shape[-1] == out_nc
    assert y.shape[1] >= size  # visgel may upsample; others preserve


def test_local_enhancer_runs():
    opt = zoo_opt(netG="local", ngf=8)
    g = define_G(opt, 1, 5, train=False)
    x = jnp.zeros((1, 64, 64, 1))
    variables = g.init(jax.random.key(0), x)
    assert g.apply(variables, x).shape == (1, 64, 64, 5)


def test_spade_generator_runs():
    opt = zoo_opt(netG="spade", normG="spectralspadesyncbatch3x3", ngf=8)
    g = define_G(opt, 1, 5, train=True)
    x = jnp.zeros((2, 32, 32, 1))
    variables = g.init(jax.random.key(0), x)
    y, _ = g.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 5)


@pytest.mark.slow
def test_stylegan2_generator_and_discriminator():
    opt = zoo_opt(netG="smallstylegan2", crop_size=64)
    g = define_G(opt, 3, 3, train=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = g.init(jax.random.key(0), x)
    assert g.apply(variables, x).shape == (1, 64, 64, 3)

    d = define_D(opt, 3, netD="stylegan2", train=False)
    variables = d.init(jax.random.key(0), x)
    assert d.apply(variables, x).shape == (1, 1)
    dt = define_D(opt, 3, netD="tilestylegan2", train=False)
    variables = dt.init(jax.random.key(0), x)
    assert dt.apply(variables, x).shape[1] == 1


@pytest.mark.parametrize("name", ["basic", "n_layers", "pixel", "patch", "multiscale"])
def test_discriminators_construct_and_run(name):
    opt = zoo_opt()
    d = define_D(opt, 4, netD=name, train=False)
    x = jnp.zeros((2, 64, 64, 4))
    variables = d.init(jax.random.key(0), x)
    y = d.apply(variables, x)
    if name == "multiscale":
        assert isinstance(y, list) and len(y) == 3
    else:
        assert y.shape[-1] == 1


def test_spectral_instance_discriminator():
    opt = zoo_opt(normD="spectralinstance")
    d = define_D(opt, 3, netD="multiscale", num_D=2, train=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables = d.init(jax.random.key(0), x)
    y, mut = d.apply(variables, x, mutable=["batch_stats"])
    assert len(y) == 2
    # spectral u vectors live in batch_stats and update on apply
    assert "batch_stats" in mut or variables.get("batch_stats")
