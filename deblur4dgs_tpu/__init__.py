"""deblur4dgs_tpu: TPU-native 4D Gaussian Splatting from blurry monocular video.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Deblur4DGS
(reference: ZcsrenlongZ/Deblur4DGS). See SURVEY.md for the layer map this
framework covers and how each reference component maps onto TPU-native design.

Layout:
  ops/       SE(3)/quaternion math, projection, tiling, rasterization kernels
  models/    Gaussians, motion bases, exposure (MoveModel), scene model
  train/     losses, optimizer groups, density control, trainer
  data/      COLMAP reader, datasets, synthetic scenes
  parallel/  device mesh + sharded train/render steps
  eval/      metrics (PSNR/SSIM/LPIPS), validator
  utils/     misc helpers
"""

__version__ = "0.1.0"
