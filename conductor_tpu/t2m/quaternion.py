"""Quaternion algebra as pure jnp functions (reference `utils/quaternion.py`).

All ops take arrays whose last dimension is 4 (w, x, y, z) and broadcast over
leading dims — vmappable, jittable, and differentiable (the torch original
keeps separate `*_np` copies of half the API; here one implementation serves
host and device via `jnp.asarray`).
"""

from __future__ import annotations

import jax.numpy as jnp


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (inverse for unit quaternions), `quaternion.py:16-21`."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*r (`quaternion.py:33-51`)."""
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)
    (`quaternion.py:54-73`), via the Rodrigues form."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2 * (q[..., :1] * uv + uuv)


def qeuler(q: jnp.ndarray, order: str = "zyx", epsilon: float = 0.0, deg: bool = True):
    """Quaternion -> Euler angles in the given order (`quaternion.py:76-125`)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    clip = lambda a: jnp.clip(a, -1 + epsilon, 1 - epsilon)
    if order == "xyz":
        e = (
            jnp.arctan2(2 * (x * w - y * z), 1 - 2 * (x * x + y * y)),
            jnp.arcsin(clip(2 * (x * z + y * w))),
            jnp.arctan2(2 * (z * w - x * y), 1 - 2 * (y * y + z * z)),
        )
    elif order == "yzx":
        e = (
            jnp.arctan2(2 * (x * w - y * z), 1 - 2 * (x * x + z * z)),
            jnp.arctan2(2 * (y * w - x * z), 1 - 2 * (y * y + z * z)),
            jnp.arcsin(clip(2 * (x * y + z * w))),
        )
    elif order == "zxy":
        e = (
            jnp.arcsin(clip(2 * (x * w + y * z))),
            jnp.arctan2(2 * (y * w - z * x), 1 - 2 * (x * x + y * y)),
            jnp.arctan2(2 * (z * w - x * y), 1 - 2 * (x * x + z * z)),
        )
    elif order == "xzy":
        e = (
            jnp.arctan2(2 * (x * w + y * z), 1 - 2 * (x * x + z * z)),
            jnp.arctan2(2 * (y * w + x * z), 1 - 2 * (y * y + z * z)),
            jnp.arcsin(clip(2 * (z * w - x * y))),
        )
    elif order == "yxz":
        e = (
            jnp.arcsin(clip(2 * (x * w - y * z))),
            jnp.arctan2(2 * (x * z + y * w), 1 - 2 * (x * x + y * y)),
            jnp.arctan2(2 * (x * y + z * w), 1 - 2 * (x * x + z * z)),
        )
    elif order == "zyx":
        e = (
            jnp.arctan2(2 * (x * w + y * z), 1 - 2 * (x * x + y * y)),
            jnp.arcsin(clip(2 * (y * w - x * z))),
            jnp.arctan2(2 * (x * y + z * w), 1 - 2 * (y * y + z * z)),
        )
    else:
        raise ValueError(f"unknown euler order {order!r}")
    e = jnp.stack(e, axis=-1)
    return jnp.degrees(e) if deg else e


def qfix(q: jnp.ndarray) -> jnp.ndarray:
    """Enforce quaternion continuity along the time axis (axis 0): flip signs
    where successive dot products are negative (`quaternion.py:149-166`)."""
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flips = jnp.cumsum(dots < 0, axis=0) % 2  # odd # of sign changes so far
    signs = jnp.concatenate(
        [jnp.ones_like(flips[:1]), jnp.where(flips == 1, -1, 1)], axis=0
    )
    return q * signs[..., None]


def euler2quat(e: jnp.ndarray, order: str = "zyx", deg: bool = True) -> jnp.ndarray:
    """Euler angles -> quaternion (`quaternion.py:169-211`)."""
    if deg:
        e = jnp.radians(e)
    half = e / 2
    zeros = jnp.zeros_like(half[..., 0])

    def axis_quat(angle, axis):
        c, s = jnp.cos(angle), jnp.sin(angle)
        parts = {"w": c, axis: s}
        return jnp.stack(
            [
                parts.get("w", zeros),
                parts.get("x", zeros),
                parts.get("y", zeros),
                parts.get("z", zeros),
            ],
            axis=-1,
        )

    q = None
    for i, axis in enumerate(order):
        qa = axis_quat(half[..., i], axis)
        q = qa if q is None else qmul(q, qa)
    return q


def expmap_to_quaternion(e: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle exponential map -> quaternion (`quaternion.py:214-230`)."""
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrices (`quaternion.py:274-300`)."""
    w, x, y, z = jnp.moveaxis(qnormalize(q), -1, 0)
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quaternion_to_cont6d(q: jnp.ndarray) -> jnp.ndarray:
    """First two rotation-matrix columns as the continuous 6-D representation
    (`quaternion.py:308-317`)."""
    m = quaternion_to_matrix(q)
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def cont6d_to_matrix(cont6d: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt the 6-D rep back to rotation matrices
    (`quaternion.py:320-336`)."""
    x = cont6d[..., :3]
    y = cont6d[..., 3:]
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    z = jnp.cross(x, y)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def qpow(q: jnp.ndarray, t) -> jnp.ndarray:
    """Quaternion power via axis-angle scaling (`quaternion.py:344-366`)."""
    q = qnormalize(q)
    theta = jnp.arccos(jnp.clip(q[..., :1], -1.0, 1.0))
    axis = q[..., 1:] / jnp.maximum(jnp.sin(theta), 1e-9)
    t_theta = jnp.asarray(t) * theta
    return jnp.concatenate([jnp.cos(t_theta), axis * jnp.sin(t_theta)], axis=-1)


def qslerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation q0 -> q1 (`quaternion.py:369-384`)."""
    q0, q1 = qnormalize(q0), qnormalize(q1)
    # shortest path
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    return qmul(q0, qpow(qmul(qinv(q0), q1), t))


def qbetween(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Minimal rotation taking v0 to v1 (`quaternion.py:387-409`)."""
    v = jnp.cross(v0, v1)
    w = jnp.sqrt(
        jnp.sum(v0**2, axis=-1, keepdims=True)
        * jnp.sum(v1**2, axis=-1, keepdims=True)
    ) + jnp.sum(v0 * v1, axis=-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def lerp(p0, p1, t):
    return p0 + jnp.asarray(t) * (p1 - p0)
