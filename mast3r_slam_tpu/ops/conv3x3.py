"""3x3 stride-1 SAME convolution as a Pallas TPU kernel.

The DPT fusion pyramid (reference mast3r/catmlp_dpt_head.py + dust3r DPT
head) is ~350 GFLOP/frame of 3x3 convs, and ``lax.conv`` runs them at ~19%
MXU on v5e (round-4 trace ledger, docs/PERFORMANCE.md) — the conv lowering
materializes an im2col-ish layout in HBM. A shifted-matmul lowering in XLA
was tried and REJECTED round 4: 9 in-program pad+slice materializations
cost more than the conv saved.

This kernel keeps the shifts in VMEM where they are free:

- the input is zero-padded ONCE in HBM (`(H, W) → (H+2, W+2)` — the only
  extra HBM traffic, ~= one activation read/write),
- a grid program per (batch, row-tile) DMAs its `(TH+2, W+2, Cin)` halo
  tile into VMEM scratch,
- the 3x3 stencil is 9 accumulated `(TH·W, Cin) @ (Cin, Cout)` MXU dots
  over in-VMEM row/column slices of the tile (no HBM re-reads), with f32
  accumulation,
- bias add + dtype cast happen in-register before the single output write.

Bit-compatibility: identical contraction order and f32 accumulation as
``lax.conv_general_dilated`` with ``preferred_element_type=f32`` up to dot
reassociation (tests pin agreement to f32 tolerance).

Used by ``models/layers.py::conv2d`` when shapes qualify (stride 1, k=3,
SAME, lane-aligned channels); falls back to ``lax.conv`` otherwise and
everywhere off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _kernel(xp_hbm, w_ref, b_ref, o_ref, xtile, sem, *, th: int, w: int,
            cin: int, has_bias: bool):
    """One (batch, row-tile) program.

    xp_hbm: (B, H+2, Wp, Cin) padded input, left in HBM/ANY. Wp is W+2
            rounded up to the sublane tile (16) so the halo DMA below copies
            whole tiling-aligned rows (Mosaic rejects unaligned DMA shapes).
    w_ref:  (3, 3, Cin, Cout) VMEM.
    b_ref:  (1, Cout) VMEM (zeros when has_bias=False — still passed to keep
            a single kernel signature; the add is skipped statically).
    o_ref:  (1, TH, W, Cout) VMEM output block.
    xtile:  (TH+2, Wp, Cin) VMEM scratch for the halo tile.
    """
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[bi, pl.ds(ti * th, th + 2), :, :], xtile, sem)
    dma.start()
    dma.wait()

    cout = w_ref.shape[-1]
    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xtile[dy:dy + th, dx:dx + w, :].reshape(th * w, cin)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if has_bias:
        acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(th, w, cout)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile(h: int, w: int, cin: int, cout: int, itemsize: int) -> int:
    """Largest divisor TH of H keeping acc (f32) and the halo tile in VMEM
    budget (~4 MB each; pallas double-buffers the output block on top)."""
    best = 0
    wp = _round_up(w + 2, 16)
    for th in range(1, h + 1):
        if h % th:
            continue
        acc_b = th * w * cout * 4
        tile_b = (th + 2) * wp * cin * itemsize
        out_b = th * w * cout * itemsize
        if acc_b <= 4 * 2**20 and tile_b <= 4 * 2**20 and out_b <= 2 * 2**20:
            best = th
    return best


def conv3x3_qualifies(x_shape, w_shape, stride, padding, itemsize=4) -> bool:
    """Shape gate for the Pallas path (see module docstring)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, cin, cout = w_shape
    if (kh, kw) != (3, 3) or stride not in (1, (1, 1)):
        return False
    if padding != "SAME":
        return False
    b, h, w, xc = x_shape
    if xc != cin or cin % 128 or cout % 128:
        return False
    if w % 16 or h < 4:
        return False
    return _pick_tile(h, w, cin, cout, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_impl(x, w, b, interpret=False):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = _pick_tile(h, wd, cin, cout, x.dtype.itemsize)
    wp = _round_up(wd + 2, 16)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0)))
    has_bias = b is not None
    if b is None:
        b = jnp.zeros((1, cout), x.dtype)
    else:
        b = b.reshape(1, cout).astype(x.dtype)

    kern = functools.partial(_kernel, th=th, w=wd, cin=cin,
                             has_bias=has_bias)
    return pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wd, cout), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w.astype(x.dtype), b)


def conv3x3(x, w, b=None, interpret=False):
    """NHWC 3x3 stride-1 SAME conv; ``w (3, 3, Cin, Cout)``, optional ``b``.

    Caller is responsible for gating via :func:`conv3x3_qualifies` (+
    :func:`supports_pallas` unless ``interpret=True``).
    """
    return _conv3x3_impl(x, w, b, interpret=interpret)
