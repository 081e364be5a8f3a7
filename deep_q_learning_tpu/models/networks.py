"""Q-value networks (Flax Linen).

Covers the reference's model family (``/root/reference/LunarLander/dddqn.py:11-34``:
MLP trunk Linear(32)->relu->Linear(64)->relu with a dueling value/advantage
head, ``Q = V + A - mean(A)``) as one configurable module, plus a plain
(non-dueling) head for vanilla DQN.

TPU notes
---------
* The reference's 32/64 trunk is far below MXU tile width (128); it runs on
  the VPU and the step is bandwidth-bound.  ``hidden=(256, 256)`` (default for
  the throughput configs) keeps matmuls MXU-shaped; the parity preset keeps
  (32, 64) to match the reference capacity.
* ``compute_dtype=bfloat16`` runs the trunk in bf16 on the MXU while keeping
  parameters and the Q output in float32 (TD targets want f32 accuracy).
* ``return_features`` mirrors the reference's penultimate-feature output
  (``dddqn.py:24,32-33``).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


class QNetwork(nn.Module):
    """MLP Q-network with optional dueling head.

    Attributes:
      num_actions: size of the discrete action space.
      hidden: trunk layer widths (reference: ``(32, 64)``, dddqn.py:19-20).
      dueling: if True, ``Q = V + A - mean_a(A)`` (dddqn.py:29-31); else a
        single linear head.
      compute_dtype: dtype for trunk activations/matmuls (bf16 for MXU).
    """

    num_actions: int
    hidden: Sequence[int] = (256, 256)
    dueling: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, return_features: bool = False
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        x = x.astype(self.compute_dtype)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, dtype=self.compute_dtype, name=f"trunk_{i}")(x)
            x = nn.relu(x)
        features = x
        if self.dueling:
            val = nn.Dense(1, dtype=jnp.float32, name="value")(x)
            adv = nn.Dense(self.num_actions, dtype=jnp.float32, name="advantage")(x)
            q = val + adv - jnp.mean(adv, axis=-1, keepdims=True)
        else:
            q = nn.Dense(self.num_actions, dtype=jnp.float32, name="q")(x)
        q = q.astype(jnp.float32)
        if return_features:
            return q, features.astype(jnp.float32)
        return q
