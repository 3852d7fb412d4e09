"""Train state: trainable params + frozen visual backbone + optimizer state.

The reference keeps three torch modules (fcmf/iaog model, resnet_img,
resnet_roi) and checkpoints them as sibling files
(run_multimodal_fcmf.py:40-58,334-335).  Here a single pytree carries
everything; the visual backbone params are a separate, non-optimized subtree
(the reference trains with `if_fine_tune=False`, resnet_utils.py:26-28; set
`fine_tune_cnn` to move them into the optimizer).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    visual_params: Any            # frozen unless fine_tune_cnn
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    fine_tune_cnn: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, params, visual_params, tx, fine_tune_cnn: bool = False):
        trainable = (params, visual_params) if fine_tune_cnn else params
        return cls(step=jnp.zeros([], jnp.int32), params=params,
                   visual_params=visual_params,
                   opt_state=tx.init(trainable), tx=tx,
                   fine_tune_cnn=fine_tune_cnn)

    def apply_gradients(self, grads, visual_grads=None):
        if self.fine_tune_cnn:
            updates, new_opt = self.tx.update(
                (grads, visual_grads), self.opt_state,
                (self.params, self.visual_params))
            pu, vu = updates
            return self.replace(
                step=self.step + 1,
                params=optax.apply_updates(self.params, pu),
                visual_params=optax.apply_updates(self.visual_params, vu),
                opt_state=new_opt)
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)
