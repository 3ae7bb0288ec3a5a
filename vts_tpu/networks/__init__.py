"""Network factories — define_G / define_D by name
(reference models/networks.py:255-442), returning flax module instances.

Modules carry a ``train`` flag (batch-norm mode); params/batch_stats live
outside in the model's TrainState pytrees.
"""

from __future__ import annotations

from typing import Any, Optional

from .blocks import make_initializer, make_norm_layer  # noqa: F401
from .discriminators import (MultiscaleDiscriminator, NLayerDiscriminator,
                             PatchDiscriminator, PixelDiscriminator)
from .positional import csg_grid, positional_encoding, spe_grid  # noqa: F401
from .unet_custom import CustomUNet


def define_G(opt, input_nc: int, output_nc: int, *, train: bool = True,
             dtype: Optional[Any] = None, axis_name: Optional[str] = None):
    """Generator factory (reference models/networks.py:255-325)."""
    name = opt.netG
    common = dict(init_type=opt.init_type, init_gain=opt.init_gain, dtype=dtype)
    if name == "unet256_custom":
        return CustomUNet(
            ngf=opt.ngf, out_nc=output_nc, num_downs=8,
            num_layer_separate=getattr(opt, "num_layer_separate", 0),
            norm_type=opt.normG, use_dropout=not opt.no_dropout,
            input_size=opt.crop_size,
            use_style_code=bool(getattr(opt, "use_style_code", False)),
            style_code_dim=int(getattr(opt, "style_code_dim", 512)),
            style_code_mode=getattr(opt, "style_code_mode", "concat"),
            style_code_mapping_mode=getattr(opt, "style_code_mapping_mode", "tile"),
            num_layer_style_code=int(getattr(opt, "num_layer_style_code", -1)),
            t_mult=int(getattr(opt, "T_resolution_multiplier", 1)),
            train=train, axis_name=axis_name, **common)
    if name in ("resnet_9blocks", "resnet_6blocks", "resnet_4blocks"):
        from .resnet_gen import ResnetGenerator
        n_blocks = {"resnet_9blocks": 9, "resnet_6blocks": 6, "resnet_4blocks": 4}[name]
        return ResnetGenerator(
            ngf=opt.ngf, out_nc=output_nc, n_blocks=n_blocks, norm_type=opt.normG,
            use_dropout=not opt.no_dropout,
            no_antialias=bool(getattr(opt, "no_antialias", False)),
            no_antialias_up=bool(getattr(opt, "no_antialias_up", False)),
            t_resolution_multiplier=int(getattr(opt, "T_resolution_multiplier", 1)),
            generate_T_imgs=bool(getattr(opt, "generate_T_imgs", False)),
            train=train, axis_name=axis_name, **common)
    if name in ("unet_256", "unet_128"):
        from .unet_plain import UnetGenerator
        return UnetGenerator(ngf=opt.ngf, out_nc=output_nc,
                             num_downs=8 if name == "unet_256" else 7,
                             norm_type=opt.normG, use_dropout=not opt.no_dropout,
                             train=train, axis_name=axis_name, **common)
    if name == "global":
        from .pix2pixhd_nets import GlobalGenerator
        return GlobalGenerator(ngf=opt.ngf, out_nc=output_nc,
                               n_downsampling=int(getattr(opt, "n_downsample_global", 4)),
                               n_blocks=int(getattr(opt, "n_blocks_global", 9)),
                               norm_type=opt.normG, train=train, axis_name=axis_name,
                               **common)
    if name == "local":
        from .pix2pixhd_nets import LocalEnhancer
        return LocalEnhancer(ngf=opt.ngf, out_nc=output_nc,
                             n_downsample_global=int(getattr(opt, "n_downsample_global", 4)),
                             n_blocks_global=int(getattr(opt, "n_blocks_global", 9)),
                             n_local_enhancers=int(getattr(opt, "n_local_enhancers", 1)),
                             n_blocks_local=int(getattr(opt, "n_blocks_local", 3)),
                             norm_type=opt.normG, train=train, axis_name=axis_name,
                             **common)
    if name == "encoder":
        from .pix2pixhd_nets import Encoder
        return Encoder(ngf=opt.ngf, out_nc=output_nc,
                       n_downsampling=int(getattr(opt, "n_downsample_global", 4)),
                       norm_type=opt.normG, train=train, axis_name=axis_name, **common)
    if name == "spade":
        from .spade_nets import SPADEGenerator
        return SPADEGenerator(
            ngf=opt.ngf, out_nc=output_nc, semantic_nc=input_nc,
            num_upsampling_layers=int(getattr(opt, "num_upsampling_layers", 3)),
            crop_size=int(getattr(opt, "output_width", opt.crop_size)),
            aspect_ratio=float(getattr(opt, "aspect_ratio", 1.0)),
            norm_g=getattr(opt, "normG", "spectralspadesyncbatch3x3"),
            use_vae=bool(getattr(opt, "use_vae", False)),
            z_dim=int(getattr(opt, "z_dim", 256)),
            train=train, axis_name=axis_name,
            init_type=opt.init_type, init_gain=opt.init_gain, dtype=dtype)
    if name == "conv_encoder":
        from .spade_nets import ConvEncoder
        return ConvEncoder(ndf=opt.ngf, crop_size=opt.crop_size,
                           z_dim=int(getattr(opt, "z_dim", 256)),
                           train=train, axis_name=axis_name, **common)
    if name == "resnet_cat":
        from .munit import GResnet
        return GResnet(ngf=opt.ngf, out_nc=output_nc, nz=int(getattr(opt, "nz", 8)),
                       num_downs=2, n_res=8 - 4, train=train, **common)
    if name in ("stylegan2", "smallstylegan2"):
        from .stylegan2 import StyleGAN2Generator
        return StyleGAN2Generator(ngf=opt.ngf, out_nc=output_nc,
                                  n_blocks=2 if name == "smallstylegan2" else None,
                                  crop_size=opt.crop_size, **common)
    if name == "visgel":
        from .visgel import VisGelGenerator
        return VisGelGenerator(ngf=opt.ngf, out_nc=output_nc,
                               t_resolution_multiplier=int(getattr(opt, "T_resolution_multiplier", 1)),
                               norm_type=opt.normG, train=train, **common)
    raise NotImplementedError(f"Generator model name {name!r} is not recognized")


def define_G2(opt, input_nc: int, output_nc: int, *, netG2: str = "VisGel",
              train: bool = True, dtype: Optional[Any] = None):
    """Super-resolution G2 factory (reference models/networks.py:344-388 —
    only the VisGel path is implemented upstream; 'add_conv' raises there too)."""
    if netG2 == "VisGel":
        from .visgel import VisGelGenerator
        return VisGelGenerator(
            ngf=opt.ngf, out_nc=output_nc,
            t_resolution_multiplier=int(getattr(opt, "T_resolution_multiplier", 2)),
            norm_type=opt.normG, init_type=opt.init_type, init_gain=opt.init_gain,
            dtype=dtype, train=train)
    raise NotImplementedError(f"super resolution model name {netG2!r} is not recognized")


def define_D(opt, input_nc: int, *, netD: Optional[str] = None,
             n_layers: Optional[int] = None, num_D: int = 3,
             train: bool = True, dtype: Optional[Any] = None,
             axis_name: Optional[str] = None):
    """Discriminator factory (reference models/networks.py:392-442)."""
    name = netD or opt.netD
    common = dict(ndf=opt.ndf, norm_type=opt.normD, init_type=opt.init_type,
                  init_gain=opt.init_gain, dtype=dtype, train=train,
                  axis_name=axis_name)
    nl = n_layers if n_layers is not None else opt.n_layers_D
    use_sigmoid = opt.gan_mode == "vanilla"
    interm = bool(getattr(opt, "getIntermFeat_D", False))
    if name == "basic":
        return NLayerDiscriminator(n_layers=3, use_sigmoid=use_sigmoid,
                                   get_interm_feat=interm, **common)
    if name == "n_layers":
        return NLayerDiscriminator(n_layers=nl, use_sigmoid=use_sigmoid,
                                   get_interm_feat=interm, **common)
    if name == "pixel":
        return PixelDiscriminator(**common)
    if name == "patch":
        return PatchDiscriminator(**common)
    if name == "multiscale":
        return MultiscaleDiscriminator(n_layers=nl, num_D=num_D,
                                       use_sigmoid=use_sigmoid,
                                       get_interm_feat=interm, **common)
    if "stylegan2" in name:
        from .stylegan2 import StyleGAN2Discriminator
        return StyleGAN2Discriminator(ndf=opt.ndf, n_layers=nl,
                                      tile=name.startswith("tile"),
                                      crop_size=opt.crop_size)
    raise NotImplementedError(f"Discriminator model name {name!r} is not recognized")
