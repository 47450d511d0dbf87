"""Tiny test worlds, mirroring the reference's TestHelpers.hpp zoo
(pendulum, cartpole, boxes, free bodies) used by the comprehensive
gradient tests (SURVEY.md section 4)."""

import numpy as np

from nimblephysics_tpu.dynamics import (
    BALL,
    FREE,
    PRISMATIC,
    REVOLUTE,
    UNIVERSAL,
    WELD,
    Skeleton,
)
from nimblephysics_tpu.dynamics.shapes import ShapeSpec


def T(p=(0, 0, 0), R=None):
    out = np.eye(4)
    out[:3, 3] = p
    if R is not None:
        out[:3, :3] = R
    return out


def pendulum(length=1.0, mass=1.0):
    """Single revolute pendulum rotating about world y, COM at -z/2."""
    sk = Skeleton("pendulum")
    sk.add_joint_and_body(
        REVOLUTE,
        parent=-1,
        name="link0",
        axis=[0.0, 1.0, 0.0],
        T_cj=T(p=(0, 0, length / 2)),  # joint sits half a link above body
        mass=mass,
        inertia=np.eye(3) * (mass * length**2 / 12.0),
    )
    return sk


def double_pendulum(length=1.0, mass=1.0):
    sk = Skeleton("double_pendulum")
    b0 = sk.add_joint_and_body(
        REVOLUTE,
        parent=-1,
        name="link0",
        axis=[0.0, 1.0, 0.0],
        T_cj=T(p=(0, 0, length / 2)),
        mass=mass,
        inertia=np.eye(3) * (mass * length**2 / 12.0),
    )
    sk.add_joint_and_body(
        REVOLUTE,
        parent=b0,
        name="link1",
        axis=[0.0, 1.0, 0.0],
        T_pj=T(p=(0, 0, -length / 2)),
        T_cj=T(p=(0, 0, length / 2)),
        mass=mass,
        inertia=np.eye(3) * (mass * length**2 / 12.0),
    )
    return sk


def cartpole():
    """Prismatic cart along x + revolute pole about y (reference:
    data/skel/cartpole.skel topology)."""
    sk = Skeleton("cartpole")
    cart = sk.add_joint_and_body(
        PRISMATIC,
        parent=-1,
        name="cart",
        axis=[1.0, 0.0, 0.0],
        mass=1.0,
        inertia=np.eye(3) * 0.05,
        shapes=(ShapeSpec("box", np.array([0.3, 0.2, 0.1])),),
    )
    sk.add_joint_and_body(
        REVOLUTE,
        parent=cart,
        name="pole",
        axis=[0.0, 1.0, 0.0],
        T_cj=T(p=(0, 0, -0.5)),  # pole COM half a meter above the pivot
        mass=0.5,
        inertia=np.eye(3) * (0.5 * 1.0 / 12.0),
        shapes=(ShapeSpec("box", np.array([0.05, 0.05, 1.0])),),
    )
    return sk


def free_box(size=(0.2, 0.2, 0.2), mass=1.0, friction=1.0, restitution=0.0):
    sk = Skeleton("box")
    from nimblephysics_tpu.math.spatial import inertia_box
    import jax.numpy as jnp

    sk.add_joint_and_body(
        FREE,
        parent=-1,
        name="box",
        mass=mass,
        inertia=np.asarray(inertia_box(mass, np.asarray(size))),
        shapes=(
            ShapeSpec(
                "box",
                np.asarray(size, dtype=np.float64),
                friction=friction,
                restitution=restitution,
            ),
        ),
    )
    return sk


def free_sphere(radius=0.1, mass=1.0, friction=1.0, restitution=0.0):
    sk = Skeleton("sphere")
    i = 0.4 * mass * radius * radius
    sk.add_joint_and_body(
        FREE,
        parent=-1,
        name="sphere",
        mass=mass,
        inertia=np.eye(3) * i,
        shapes=(
            ShapeSpec(
                "sphere",
                np.array([radius]),
                friction=friction,
                restitution=restitution,
            ),
        ),
    )
    return sk


def ground_plane(mu=1.0, restitution=1.0):
    """Static (weld-rooted) ground: z = 0 plane.

    Ground restitution defaults to 1 so the pair coefficient (product rule)
    equals the dynamic object's own restitution."""
    sk = Skeleton("ground")
    sk.add_joint_and_body(
        WELD,
        parent=-1,
        name="ground",
        mass=1.0,
        shapes=(
            ShapeSpec(
                "plane",
                np.array([0.0, 0.0, 1.0, 0.0]),
                friction=mu,
                restitution=restitution,
            ),
        ),
    )
    return sk


def ball_chain(n=3, length=0.5, mass=1.0):
    """n-link ball-joint chain hanging from the origin."""
    sk = Skeleton("chain")
    parent = -1
    for i in range(n):
        parent = sk.add_joint_and_body(
            BALL,
            parent=parent,
            name=f"link{i}",
            T_pj=T(p=(0, 0, -length / 2)) if i > 0 else T(),
            T_cj=T(p=(0, 0, length / 2)),
            mass=mass,
            inertia=np.eye(3) * (mass * length**2 / 12.0),
        )
    return sk
