"""Spatial (6D) inertia and primitive-shape inertia formulas.

Reference parity: dart/dynamics/Inertia.hpp (spatial inertia assembly) and
each Shape::computeInertia (BoxShape/SphereShape/... in dart/dynamics).
[angular; linear] spatial-vector ordering throughout.
"""

from __future__ import annotations

import jax.numpy as jnp

from nimblephysics_tpu.math.lie import skew


def spatial_inertia_matrix(
    mass: jnp.ndarray, com: jnp.ndarray, moment: jnp.ndarray
) -> jnp.ndarray:
    """6x6 spatial inertia about the body-frame origin.

    `moment` is the 3x3 rotational inertia about the COM, in the body frame.
    G = [[I_com + m [c]x [c]x^T, m [c]x], [m [c]x^T, m I3]].
    Reference parity: dynamics::Inertia::getSpatialTensor.
    """
    c = skew(com)
    ct = jnp.swapaxes(c, -1, -2)
    eye = jnp.eye(3, dtype=jnp.result_type(mass, com, moment))
    m = jnp.asarray(mass)[..., None, None]
    top = jnp.concatenate([moment + m * (c @ ct), m * c], axis=-1)
    bottom = jnp.concatenate([m * ct, m * eye], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def inertia_box(mass, size):
    """Moment of a solid box with full side lengths `size` (3,)."""
    size = jnp.asarray(size)
    x, y, z = size[..., 0], size[..., 1], size[..., 2]
    d = (
        jnp.stack([y * y + z * z, x * x + z * z, x * x + y * y], axis=-1)
        * jnp.asarray(mass)[..., None]
        / 12.0
    )
    return d[..., :, None] * jnp.eye(3, dtype=d.dtype)


def inertia_sphere(mass, radius):
    i = 0.4 * mass * radius * radius
    return jnp.asarray(i)[..., None, None] * jnp.eye(3)


def inertia_ellipsoid(mass, size):
    """Ellipsoid with full axis lengths `size` (diameters, DART convention)."""
    size = jnp.asarray(size)
    r = size / 2.0
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    d = (
        jnp.stack([y * y + z * z, x * x + z * z, x * x + y * y], axis=-1)
        * jnp.asarray(mass)[..., None]
        / 5.0
    )
    return d[..., :, None] * jnp.eye(3, dtype=d.dtype)


def inertia_cylinder(mass, radius, height):
    """Solid cylinder, axis along z."""
    rr = radius * radius
    hh = height * height
    ixx = mass * (3.0 * rr + hh) / 12.0
    izz = mass * rr / 2.0
    return jnp.diag(jnp.stack([ixx, ixx, izz]))


def inertia_capsule(mass, radius, height):
    """Solid capsule, axis along z (cylinder of `height` + hemispherical caps).

    Reference parity: CapsuleShape::computeInertia
    (dart/dynamics/CapsuleShape.cpp).
    """
    rr = radius * radius
    # Split mass between cylinder and sphere caps by volume.
    v_cyl = jnp.pi * rr * height
    v_sph = 4.0 / 3.0 * jnp.pi * rr * radius
    v = v_cyl + v_sph
    m_cyl = mass * v_cyl / v
    m_sph = mass * v_sph / v
    h = height
    ixx = (
        m_cyl * (3.0 * rr + h * h) / 12.0
        + m_sph * (0.4 * rr + 0.375 * radius * h + 0.25 * h * h)
    )
    izz = m_cyl * rr / 2.0 + m_sph * 0.4 * rr
    return jnp.diag(jnp.stack([ixx, ixx, izz]))
