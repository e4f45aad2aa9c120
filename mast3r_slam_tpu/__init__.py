"""mast3r_slam_tpu — TPU-native (JAX/XLA/Pallas) real-time dense monocular SLAM framework.

A from-scratch rebuild of the capabilities of MASt3R-SLAM-Quality-dualTSDF
(reference: /root/reference) designed for TPU hardware:

- ``ops``        : Sim(3)/SE(3) Lie algebra, geometry, robust kernels, the
                   iterative-projection matcher, Pallas flash attention.
- ``models``     : MASt3R two-view transformer (ViT-L encoder, cross-attention
                   decoder, DPT + catMLP heads) as pure-pytree JAX with a
                   torch-checkpoint converter (``convert``) and SLAM-facing
                   inference wrappers (``inference``).
- ``slam``       : frame/keyframe state, frontend tracker (one fused XLA
                   program per frame), backend factor graph + global
                   Gauss-Newton BA (on-device Cholesky), retrieval, pipeline.
- ``services``   : asynchronous pointmap-quality assessment, local per-keyframe
                   TSDF refinement, global sparse TSDF (native C++ voxel hash).
- ``parallel``   : device-mesh sharding of batched pair decodes + BA reductions.
- ``data``       : dataset adapters (TUM / EuRoC / ETH3D / 7-Scenes / Replica /
                   MP4 / RGB folder / Webcam / RealSense) + image preprocessing.
- ``viz``        : headless snapshot renderer + GLFW/OpenGL viewer.
- ``evaluation`` : trajectory/PLY export, built-in evo_ape-equivalent ATE.
- ``utils``      : config system, tic/toc + xprof tracing, checkpoint/resume,
                   persistent-compile-cache setup.

See PARITY.md for the component-by-component map to the reference system.
"""

__version__ = "0.1.0"
