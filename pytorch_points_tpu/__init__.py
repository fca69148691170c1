"""pytorch_points_tpu — a TPU-native point-cloud deep-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``yifita/pytorch_points`` (see SURVEY.md): fused TPU kernels for pairwise
losses (Chamfer / nndistance, auction Earth Mover's Distance), sampling
(furthest point sampling + gather), neighborhood ops (kNN, ball query,
feature grouping, three_nn / three_interpolate), composite losses,
PointNet++-style set-abstraction / feature-propagation layers, mesh geometry
operators, and point-cloud I/O — all with `custom_vjp` rules so everything
trains under `jit` / `vmap` / `pjit`.

Design stance (TPU-first, not a port):
  * static shapes + explicit masks instead of ragged CUDA threads
    (see `pytorch_points_tpu.core`),
  * one shared pairwise-distance tile primitive on the MXU feeding
    streaming argmin / top-k scans on the VPU (`pytorch_points_tpu.kernels`),
  * deterministic `segment_sum`/scatter backward passes instead of
    atomicAdd (bitwise-reproducible gradients),
  * channels-last `[B, N, C]` native layout (MXU-friendly); the reference's
    `[B, C, N]` layout is available via `pytorch_points_tpu.compat`.
"""

__version__ = "0.1.0"

from pytorch_points_tpu.ops import (  # noqa: F401
    ball_query,
    batch_normals,
    chamfer_distance,
    earth_mover_distance,
    furthest_point_sample,
    furthest_point_sample_and_gather,
    gather_points,
    group_knn,
    group_points,
    knn,
    nndistance,
    normalize_point_batch,
    normalize_to_box,
    sample_and_group,
    three_interpolate,
    three_nn,
    voxel_downsample_mask,
)

from pytorch_points_tpu import (  # noqa: F401
    core,
    geo,
    kernels,
    layers,
    losses,
    models,
    ops,
    parallel,
    utils,
)
