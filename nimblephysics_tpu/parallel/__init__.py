"""Multi-chip scaling layer (SURVEY.md 2.10 TPU-native equivalents).

The reference's complete concurrency surface is thread-parallel shots
over cloned worlds (MultiShot.cpp:183-230) and background optimizer
threads; its TPU-native equivalent is a batch axis (`vmap`) sharded over a
device mesh (`shard_map`) with XLA collectives over ICI. There is no model
to tensor/pipeline-shard — physics state per world is tiny — so the
decomposition is replicated program + sharded world batch (+ psum'd
gradients for learning loops), scaling to multi-host DCN meshes unchanged.
"""

from nimblephysics_tpu.parallel.mesh import (
    WORLDS_AXIS,
    make_mesh,
    shard_worlds,
    sharded_env_step,
    sharded_train_step,
    shard_worlds_minor,
    sharded_train_step_batched,
)
