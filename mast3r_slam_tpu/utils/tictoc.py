"""Device-aware tic/toc timers (reference: mast3r_slam/tictoc.py:4-30).

The reference synchronizes CUDA events; the JAX equivalent blocks on device
work via ``block_until_ready``. Also provides a cumulative section profiler
and a thin wrapper around ``jax.profiler`` trace capture for xprof.
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax

_stack: list[float] = []
_sections: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])


def sync():
    """Block until all outstanding device work is complete."""
    try:
        jax.block_until_ready(jax.device_put(0.0))
    except Exception:
        pass


def tic():
    sync()
    _stack.append(time.perf_counter())


def toc(tag: str = "") -> float:
    sync()
    dt = time.perf_counter() - _stack.pop()
    print(f"[tictoc] {tag}: {dt:.6f}s")
    return dt


@contextlib.contextmanager
def section(name: str, sync_device: bool = False):
    """Accumulating timer: ``with section("track"): ...``; see report()."""
    if sync_device:
        sync()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync_device:
            sync()
        s = _sections[name]
        s[0] += time.perf_counter() - t0
        s[1] += 1


def report() -> dict:
    out = {}
    for name, (total, n) in sorted(_sections.items()):
        out[name] = {"total_s": total, "calls": n,
                     "mean_ms": 1e3 * total / max(n, 1)}
        print(f"[tictoc] {name:24s} {total:8.3f}s / {n:6d} calls "
              f"= {1e3 * total / max(n, 1):8.2f} ms")
    return out


def reset():
    _sections.clear()


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture an xprof trace of the enclosed block (view with xprof/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[tictoc] trace written to {logdir}")
