"""Bundled model zoo (reference: data/skel + data/urdf assets).

Models load from the bundled asset copies (assets/) or build
programmatically; each returns (World, q0, v0).
"""

from nimblephysics_tpu.models.builtin import (
    cartpole,
    half_cheetah,
    inverted_double_pendulum,
    box_drop,
    box_stack,
    jump_worm,
    catapult,
)
from nimblephysics_tpu.models.human import (
    human_standing,
    rajagopal_humanoid,
)
from nimblephysics_tpu.models.rajagopal import (
    RajagopalANSURModel,
    RajagopalHumanBodyModel,
    rajagopal_data_dir,
)
