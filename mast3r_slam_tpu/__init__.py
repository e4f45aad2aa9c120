"""mast3r_slam_tpu — TPU-native (JAX/XLA/Pallas) real-time dense monocular SLAM framework.

A from-scratch rebuild of the capabilities of MASt3R-SLAM-Quality-dualTSDF
(reference: /root/reference) designed for TPU hardware:

- ``ops``      : Sim(3)/SE(3) Lie algebra, geometry, robust kernels, matching,
                 bundle-adjustment linear algebra — all jittable JAX, Pallas for hot kernels.
- ``models``   : MASt3R two-view transformer (ViT-L encoder, cross-attention decoder,
                 DPT + catMLP heads) as pure-pytree JAX with a torch-checkpoint converter.
- ``slam``     : frontend tracker, keyframe ring buffer, backend factor graph + global
                 Gauss-Newton bundle adjustment (on-device Cholesky), retrieval, reloc.
- ``services`` : asynchronous pointmap-quality assessment, local per-keyframe TSDF
                 refinement, global sparse TSDF volume + TSDF pose optimizer.
- ``parallel`` : device-mesh sharding of batched keyframe-pair decodes and BA reductions.
- ``data``     : dataset adapters (TUM / EuRoC / ETH3D / 7-Scenes / Replica / MP4 / ...).
- ``eval``     : trajectory export (TUM format), dense PLY export, ATE evaluation.
"""

__version__ = "0.1.0"
