"""Lane-major vector type: a vec3 as three dense (B,) component arrays.

Why this exists (TPU layout): a batched ``f32[B, 3]`` array is tiled
``T(8,128)`` on TPU — the minor dimension pads 3 → 128 lanes, so every
elementwise fusion over row-major vectors moves ~42x the useful bytes.
The round-3 cbbunny profile showed ~40% of device time in exactly such
fusions. Components stored as separate 1-D arrays use the dense
``T(1024)`` layout (zero padding), and the Pallas traversal kernels
consume per-component (rows, 128) tiles anyway, so this representation
also makes kernel input prep a free reshape.

V3 is a NamedTuple, hence a JAX pytree: it flows through jit,
``lax.while_loop`` carries, and ``jnp.where``-style masking via
``V3.where``. Arithmetic broadcasts like the row representation did,
except scalars/(B,) arrays need no ``[..., None]``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class V3(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array

    # --- construction / conversion -------------------------------------
    @staticmethod
    def from_rows(a) -> "V3":
        """From a (..., 3) row-major array (boundary conversion; reads the
        padded layout once — keep off per-bounce hot paths)."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    def rows(self):
        """To a (..., 3) row-major array (boundary conversion)."""
        x, y, z = jnp.broadcast_arrays(self.x, self.y, self.z)
        return jnp.stack([x, y, z], axis=-1)

    @staticmethod
    def const(cx, cy, cz, dtype=jnp.float32) -> "V3":
        return V3(jnp.asarray(cx, dtype), jnp.asarray(cy, dtype),
                  jnp.asarray(cz, dtype))

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "V3":
        z = jnp.zeros(shape, dtype)
        return V3(z, z, z)

    @staticmethod
    def full(shape, v, dtype=jnp.float32) -> "V3":
        return V3(jnp.full(shape, v, dtype), jnp.full(shape, v, dtype),
                  jnp.full(shape, v, dtype))

    # --- arithmetic ------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        return V3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # --- geometry ----------------------------------------------------------
    def dot(self, o: "V3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "V3") -> "V3":
        return V3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def norm(self):
        return jnp.sqrt(self.dot(self))

    def normalize(self, eps: float = 0.0) -> "V3":
        n = self.norm()
        safe = jnp.where(n > eps, n, 1.0)
        return self / safe

    # --- elementwise helpers -------------------------------------------
    def abs(self) -> "V3":
        return V3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def astype(self, dt) -> "V3":
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))

    def max_component(self):
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    def sum(self):
        return self.x + self.y + self.z

    def isfinite(self):
        return (jnp.isfinite(self.x) & jnp.isfinite(self.y)
                & jnp.isfinite(self.z))

    def any_nonzero(self):
        return (self.x != 0.0) | (self.y != 0.0) | (self.z != 0.0)

    @staticmethod
    def where(m, a, b) -> "V3":
        """Per-lane select; m is (B,) (no [:, None] broadcasting needed)."""
        ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
        bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
        return V3(jnp.where(m, ax, bx), jnp.where(m, ay, by),
                  jnp.where(m, az, bz))

    @staticmethod
    def minimum(a: "V3", b: "V3") -> "V3":
        return V3(jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y),
                  jnp.minimum(a.z, b.z))

    @staticmethod
    def maximum(a: "V3", b: "V3") -> "V3":
        return V3(jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y),
                  jnp.maximum(a.z, b.z))
