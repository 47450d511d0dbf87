"""BatchedEnv: vmapped gym-style wrapper over the differentiable step.

The reference exposes an RL state/action API on World (World.hpp:471-523)
consumed by torch training loops; the TPU-native equivalent is a batched,
jit-compiled environment whose whole (step, reward, auto-reset) transition
runs on-device — BASELINE config #5's training-loop substrate.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nimblephysics_tpu.simulation.world import World


class EnvState(NamedTuple):
    state: jnp.ndarray  # (B, 2nv)
    steps: jnp.ndarray  # (B,) int32 steps since reset
    key: jnp.ndarray  # PRNG key


class StepOutput(NamedTuple):
    env_state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


class BatchedEnv:
    """All methods are pure and pre-jitted; batch lives on-device.

    reward_fn(state, action, next_state) -> scalar
    done_fn(next_state, steps) -> bool (horizon auto-reset included)
    reset_sampler(key) -> (2nv,) initial state
    """

    def __init__(
        self,
        world: World,
        reward_fn: Callable,
        reset_sampler: Optional[Callable] = None,
        done_fn: Optional[Callable] = None,
        horizon: int = 1000,
        batch_size: int = 1024,
    ):
        # Lazy import: neural.timestep imports simulation.world, and this
        # module is re-exported from simulation/__init__ — importing at
        # module scope would be circular.
        from nimblephysics_tpu.neural.timestep import get_engine

        self.world = world
        self.engine = get_engine(world)
        self.batch_size = batch_size
        nv = world.num_dofs

        if reset_sampler is None:
            reset_sampler = lambda key: 0.01 * jax.random.normal(
                key, (2 * nv,)
            )
        if done_fn is None:
            done_fn = lambda s, steps: steps >= horizon

        engine = self.engine

        def _reset_one(key):
            return reset_sampler(key)

        def _step_one(state, action, steps, key):
            nxt = engine.state_step(state, action)
            r = reward_fn(state, action, nxt)
            d = done_fn(nxt, steps + 1)
            key, sub = jax.random.split(key)
            fresh = _reset_one(sub)
            nxt = jnp.where(d, fresh, nxt)
            steps = jnp.where(d, 0, steps + 1)
            return nxt, r, d, steps, key

        @jax.jit
        def reset(key):
            keys = jax.random.split(key, batch_size + 1)
            states = jax.vmap(_reset_one)(keys[1:])
            return EnvState(
                states, jnp.zeros(batch_size, jnp.int32), keys[0]
            )

        @jax.jit
        def step(env_state: EnvState, actions):
            keys = jax.random.split(env_state.key, batch_size + 1)
            nxt, r, d, steps, _ = jax.vmap(_step_one)(
                env_state.state, actions, env_state.steps, keys[1:]
            )
            new = EnvState(nxt, steps, keys[0])
            return StepOutput(new, nxt, r, d)

        self.reset = reset
        self.step = step

    @property
    def observation_size(self) -> int:
        return 2 * self.world.num_dofs

    @property
    def action_size(self) -> int:
        return self.world.action_size
