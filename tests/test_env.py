"""BatchedEnv tests: on-device RL loop with auto-reset."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import cartpole
from nimblephysics_tpu.simulation import BatchedEnv


def test_batched_env_loop():
    world, q0, v0 = cartpole()
    world.set_action_space([0])

    def reward(s, a, s2):
        return 1.0 - jnp.abs(s2[1])  # keep pole upright

    env = BatchedEnv(world, reward, horizon=5, batch_size=16)
    st = env.reset(jax.random.PRNGKey(0))
    assert st.state.shape == (16, 4)
    total = jnp.zeros(16)
    for k in range(7):
        actions = jnp.zeros((16, 1))
        out = env.step(st, actions)
        st = out.env_state
        total = total + out.reward
    # horizon=5: every env must have auto-reset at step 5 (done flag seen)
    assert st.state.shape == (16, 4)
    assert bool(jnp.all(st.steps < 5 + 1))
    assert bool(jnp.all(jnp.isfinite(total)))


def test_grad_through_env_rollout():
    """Differentiable-sim policy gradient: d(return)/d(policy params)."""
    world, q0, v0 = cartpole()
    world.set_action_space([0])
    from nimblephysics_tpu.neural.timestep import get_engine

    engine = get_engine(world)

    def rollout_return(w):
        def body(s, _):
            a = jnp.tanh(s @ w)  # linear policy
            s2 = engine.state_step(s, a)
            return s2, -jnp.abs(s2[1])

        s0 = jnp.array([0.0, 0.2, 0.0, 0.0])
        _, rs = jax.lax.scan(body, s0, None, length=20)
        return rs.sum()

    w0 = jnp.zeros((4, 1))
    g = jax.grad(rollout_return)(w0)
    assert g.shape == (4, 1)
    assert bool(jnp.any(jnp.abs(g) > 1e-6))
