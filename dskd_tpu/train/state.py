"""Train state: params + frozen stats + optimizer + RNG, one pytree.

The frozen teacher is carried as a separate variables pytree next to the
student state — promoting the student to teacher at a task boundary is a
pure pytree copy (the TPU-native analog of the reference's
``set_teacher(model=copy.deepcopy(model))``, train_increment.py:241-251).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx, rng):
        return cls(step=jax.numpy.zeros((), jax.numpy.int32), params=params,
                   batch_stats=batch_stats,
                   opt_state=tx.init(params), rng=rng, tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
