"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates the TPU-native replacement for the reference's thread-parallel
world clones (dart/trajectory/MultiShot.cpp:183-230) — the shard_map
train step the driver's ``dryrun_multichip`` exercises — entirely inside
pytest, so multi-chip correctness is gated by CI, not just the driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.neural.timestep import Engine
from nimblephysics_tpu.parallel import (
    make_mesh,
    shard_worlds,
    sharded_env_step,
    sharded_train_step,
)

N_DEV = 8


@pytest.fixture(scope="module")
def cheetah():
    from nimblephysics_tpu.models import half_cheetah

    world, q0, v0 = half_cheetah()
    return world, Engine(world), np.concatenate([q0, v0])


def test_mesh_has_8_devices():
    mesh = make_mesh(N_DEV)
    assert mesh.devices.size == N_DEV


def test_sharded_env_step_matches_single_device(cheetah):
    world, engine, x0 = cheetah
    mesh = make_mesh(N_DEV)
    batch = 2 * N_DEV
    states = jnp.tile(jnp.asarray(x0)[None], (batch, 1))
    states = states.at[:, 1].add(jnp.linspace(-0.01, 0.01, batch))
    actions = 0.1 * jnp.ones((batch, world.action_size))

    ref = jax.vmap(engine.state_step)(states, actions)
    out = sharded_env_step(engine, mesh)(
        shard_worlds(mesh, states), shard_worlds(mesh, actions)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_sharded_train_step_runs_and_matches_replicated_grad(cheetah):
    world, engine, x0 = cheetah
    mesh = make_mesh(N_DEV)
    nv, na = world.num_dofs, world.action_size
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "w1": jax.random.normal(k1, (2 * nv, 8)) * 0.1,
        "b1": jnp.zeros(8),
        "w2": jax.random.normal(k2, (8, na)) * 0.1,
        "b2": jnp.zeros(na),
    }

    def policy(p, s):
        return jnp.tanh(s @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]

    batch = 2 * N_DEV
    states = jnp.tile(jnp.asarray(x0)[None], (batch, 1))
    states = states.at[:, 1].add(jnp.linspace(-0.01, 0.01, batch))
    states = shard_worlds(mesh, states)

    train = sharded_train_step(engine, mesh, policy, horizon=2)
    params2, states2, loss = train(params, states)
    jax.block_until_ready((params2, states2, loss))
    assert np.isfinite(float(loss))
    # Params must change (gradient actually flowed through the physics) and
    # remain replicated (identical on every device shard).
    delta = sum(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(params), jax.tree.leaves(params2)
        )
    )
    assert delta > 0.0
    assert states2.shape == (batch, 2 * nv)
