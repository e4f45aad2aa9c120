"""Device-mesh sharding for multi-chip scale-out (jax.sharding / GSPMD).

The reference scales by splitting work across 3 CUDA processes with
shared-memory tensors (reference: main.py:209-303, frame.py:125-253). The
TPU-native design instead shards the two batch-heavy computations over an ICI
mesh and lets XLA insert the collectives:

1. **Backend edge decodes** — the symmetric keyframe-pair decoder batch
   (the reference loops pairs one at a time, mast3r_utils.py:83-115) is
   data-parallel over the ``edge`` axis: each chip decodes a slice of the
   candidate-pair batch. This is the north-star parallelism from BASELINE.md.
2. **Bundle-adjustment reduction** — per-edge residual/Jacobian/Hessian
   contributions are sharded over edges; the dense (cap*7)² normal equations
   emerge from an XLA ``psum`` over the edge axis and every chip solves the
   (tiny) Cholesky redundantly, avoiding any host round-trip.

Nothing here requires N physical chips: the same code runs on a virtual
``xla_force_host_platform_device_count`` CPU mesh for tests and on a TPU pod
slice in production.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EDGE_AXIS = "edge"


def make_mesh(n_devices: int | None = None, axis_name: str = EDGE_AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` visible devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def edge_sharding(mesh: Mesh, axis_name: str = EDGE_AXIS) -> NamedSharding:
    """Shard the leading (edge/batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading(x, mesh: Mesh, axis_name: str = EDGE_AXIS):
    """Place ``x`` with its leading dim sharded over the mesh (pads NOT added —
    callers must pass a leading dim divisible by mesh size; the factor graph's
    power-of-two edge buckets guarantee this for mesh sizes ≤ bucket)."""
    return jax.device_put(x, edge_sharding(mesh, axis_name))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
