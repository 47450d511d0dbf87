"""Device-mesh data parallelism over batched worlds.

TPU-native replacement for the reference's thread-parallel world clones
(dart/trajectory/MultiShot.cpp:183-230 `mParallelWorlds`) and its gRPC
remoting: a 1-D `worlds` mesh axis shards the environment batch across
chips; parameters (policies, model params) stay replicated; gradient
reductions are `psum` over ICI. No hand-written communication backend —
XLA compiles the collectives (SURVEY.md 2.10).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WORLDS_AXIS = "worlds"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the world-batch axis (ICI-ring friendly)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (WORLDS_AXIS,))


def shard_worlds(mesh: Mesh, batch):
    """Place a batch pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(WORLDS_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def sharded_env_step(engine, mesh: Mesh):
    """Batched world step sharded over chips: (B, 2nv), (B, na) -> (B, 2nv).

    Pure SPMD: no cross-world communication, so XLA emits zero collectives
    — each chip steps its shard of worlds independently.
    """
    step = jax.vmap(engine.state_step)

    @partial(
        jax.jit,
        in_shardings=(
            NamedSharding(mesh, P(WORLDS_AXIS)),
            NamedSharding(mesh, P(WORLDS_AXIS)),
        ),
        out_shardings=NamedSharding(mesh, P(WORLDS_AXIS)),
    )
    def fn(states, actions):
        return step(states, actions)

    return fn


def sharded_train_step(
    engine,
    mesh: Mesh,
    policy_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    horizon: int = 8,
    learning_rate: float = 1e-3,
):
    """Differentiable-sim policy-gradient training step over the mesh.

    Layout: policy params REPLICATED, world states SHARDED over `worlds`.
    Each chip rolls out its shard through the differentiable physics,
    backprops through the rollout, and the parameter gradient is psum'd
    over ICI (the only collective). This is BASELINE config #5
    (4096-world policy-gradient loop) in its multi-chip form.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    nv = engine.world.num_dofs

    def local_loss(params, states):
        def body(s, _):
            a = policy_apply(params, s)
            s2 = jax.vmap(engine.state_step)(s, a)
            # forward-progress reward on dof 0, control penalty
            r = s2[:, 0] - s[:, 0] - 1e-3 * jnp.sum(a * a, axis=-1)
            return s2, r

        states2, rs = jax.lax.scan(body, states, None, length=horizon)
        return -jnp.mean(jnp.sum(rs, axis=0)), states2

    def train_step_local(params, states):
        (loss, states2), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, states)
        # Average loss/grads across chips over ICI.
        loss = jax.lax.pmean(loss, WORLDS_AXIS)
        grads = jax.lax.pmean(grads, WORLDS_AXIS)
        params = jax.tree.map(lambda p, g: p - learning_rate * g, params, grads)
        return params, states2, loss

    fn = shard_map(
        train_step_local,
        mesh=mesh,
        in_specs=(P(), P(WORLDS_AXIS)),
        out_specs=(P(), P(WORLDS_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Batch-minor (lane-major) variants for nimblephysics_tpu.batched
# ---------------------------------------------------------------------------


def shard_worlds_minor(mesh: Mesh, batch):
    """Place a batch-minor pytree (world batch = TRAILING axis) with that
    axis sharded over the mesh: (..., B) -> P(None, ..., 'worlds')."""

    def put(x):
        spec = P(*([None] * (x.ndim - 1) + [WORLDS_AXIS]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def sharded_train_step_batched(
    bengine,
    mesh: Mesh,
    policy_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    horizon: int = 8,
    learning_rate: float = 1e-3,
):
    """Policy-gradient train step over the mesh for the batch-minor engine.

    Identical layout story to sharded_train_step (params replicated, worlds
    sharded, one psum over ICI) with states (2nv, B) sharded on the
    TRAILING axis — per chip the local shard keeps its lane-major layout,
    so multi-chip scaling preserves the single-chip throughput design.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    nv = bengine.world.num_dofs

    def local_loss(params, states):
        def body(s, _):
            a = policy_apply(params, s)  # (na, B_local)
            s2 = bengine.state_step(s, a)
            # Reward = forward ROOT VELOCITY (policy-gradient signal
            # through the direct force->velocity channel; per-step
            # displacement over a dryrun-sized horizon is too small to
            # exceed f32 noise) minus an effort penalty.
            r = s2[nv] - 1e-3 * jnp.sum(a * a, axis=0)
            return s2, r

        states2, rs = jax.lax.scan(body, states, None, length=horizon)
        return -jnp.mean(jnp.sum(rs, axis=0)), states2

    def train_step_local(params, states):
        (loss, states2), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, states)
        loss = jax.lax.pmean(loss, WORLDS_AXIS)
        grads = jax.lax.pmean(grads, WORLDS_AXIS)
        params = jax.tree.map(
            lambda p, g: p - learning_rate * g, params, grads
        )
        return params, states2, loss

    fn = shard_map(
        train_step_local,
        mesh=mesh,
        in_specs=(P(), P(None, WORLDS_AXIS)),
        out_specs=(P(), P(None, WORLDS_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)
