"""deep_q_learning_tpu — a TPU-native deep Q-learning framework.

Built from scratch against the capability surface of
``hal9000universe/deep-q-learning`` (see SURVEY.md), re-architected
device-first: pure-JAX vectorized environments, HBM-resident replay, a fused
jitted actor-learner superstep, Pallas kernels for the hot ops, and
mesh-sharded scaling over the "env" axis.
"""

__version__ = "0.1.0"

from deep_q_learning_tpu.config import DQNConfig, PRESETS
