"""Robust loss weights and Gauss-Newton convergence helpers (pure JAX).

Parity with reference mast3r_slam/nonlinear_optimizer.py, but convergence is
expressed as a jit-safe predicate for use inside ``lax.while_loop``.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(r, k: float = 1.345):
    """Huber IRLS weight: 1 inside the kernel, k/|r| outside."""
    r_abs = jnp.abs(r)
    return jnp.where(r_abs < k, jnp.ones_like(r), k / jnp.where(r_abs < k, 1.0, r_abs))


def tukey(r, t: float = 4.6851):
    """Tukey biweight IRLS weight."""
    r_abs = jnp.abs(r)
    tmp = 1.0 - jnp.square(r_abs / t)
    return jnp.where(r_abs < t, tmp * tmp, jnp.zeros_like(r))


def converged(rel_error_threshold, delta_norm_threshold, old_cost, new_cost, delta):
    """Jit-safe convergence predicate (relative cost decrease OR small step)."""
    rel_dec = jnp.abs((old_cost - new_cost) / old_cost)
    delta_norm = jnp.linalg.norm(delta)
    return (rel_dec < rel_error_threshold) | (delta_norm < delta_norm_threshold)
