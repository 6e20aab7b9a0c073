"""Batched vector helpers for SoA device math (last axis = xyz)."""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a, eps: float = 0.0):
    n = norm(a)
    safe = jnp.where(n > eps, n, 1.0)
    return a / safe[..., None]


def apply_point(m, p):
    """Apply 4x4 (row-major, column-vector) to points; m: (..., 4, 4), p: (..., 3)."""
    r = jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]
    w = jnp.einsum("...j,...j->...", m[..., 3, :3], p) + m[..., 3, 3]
    return r / w[..., None]


def apply_vector(m, v):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


def apply_vector_transposed(m, v):
    """M^T v on the 3x3 block (inverse-transpose normal transform)."""
    return jnp.einsum("...ji,...j->...i", m[..., :3, :3], v)


def make_orthonormal_basis(z):
    """Batched ONB: from unit z produce (x, y) (geometry.rs:8-20 semantics)."""
    a = jnp.where(
        (jnp.abs(z[..., 2]) < 0.8)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], z.dtype), z.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], z.dtype), z.shape),
    )
    x = normalize(jnp.cross(a, z))
    y = jnp.cross(z, x)
    return x, y
