"""vts_tpu — a TPU-native (JAX/XLA/Pallas) visual-tactile synthesis framework.

Re-designed from scratch with the capabilities of the reference PyTorch framework
"Controllable Visual-Tactile Synthesis" (RuihanGao/visual-tactile-synthesis,
ICCV 2023): given a garment sketch, synthesize a synchronized RGB visual image
and a 2-channel tactile gradient field (gx, gy).

Layout conventions (TPU-first, differ deliberately from the reference):
  * images are NHWC (channels-last) — the native TPU conv layout;
  * all shapes are static inside ``jit``; variable-size patch sets are padded
    to a fixed K with a validity mask;
  * parameters are fp32; compute dtype is a policy (fp32 or bf16);
  * randomness is explicit ``jax.random`` keys threaded through every op.

Subpackages
  config    typed option system (3-stage CLI composition, like the reference's
            options/ package — reference options/base_options.py:221-258)
  data      host-side data pipeline: coordinate transforms, SKIT datasets,
            synthetic data, device prefetch
  networks  flax.linen network zoo (generators, discriminators, encodings)
  ops       TPU compute ops (patch gather, resize, diffaug, upfirdn2d, pallas)
  losses    GAN / L1 / LPIPS / feature-matching / surface-normal losses
  metrics   SIFID, tactile-patch FID, PSNR/SSIM, LPIPS-metric, angle error
  models    trainable model families (sinskit, skit, pix2pix, pix2pixhd, spade)
  parallel  mesh construction, sharding rules, garment-fleet parallelism
  utils     registries, image io, html reports, visualizer/logging
"""

__version__ = "0.1.0"
