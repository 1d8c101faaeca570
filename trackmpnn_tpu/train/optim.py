"""Optimizer + LR schedule matching the reference recipe.

torch.optim.Adam with weight_decay adds wd * param to the *gradient* before
the moment updates (L2, not AdamW), and StepLR multiplies lr by gamma every
`step_size` epochs (ref train.py:329-330: Adam(lr=1e-4, wd=5e-4),
StepLR(15, 0.2)).  We reproduce that with optax: add_decayed_weights before
adam, and an epoch-indexed lr via inject_hyperparams.
"""

from __future__ import annotations

import optax


def step_lr(base_lr: float, step_size: int = 15, gamma: float = 0.2):
    """epoch (1-indexed like the reference loop) -> lr."""

    def lr(epoch: int) -> float:
        return base_lr * (gamma ** ((epoch - 1) // step_size))

    return lr


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 5e-4):
    """Returns an optax transform whose lr is adjustable per epoch via
    opt_state.hyperparams['learning_rate']."""
    return optax.inject_hyperparams(_adam_l2)(learning_rate=learning_rate,
                                              weight_decay=weight_decay)


def _adam_l2(learning_rate, weight_decay):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-learning_rate),
    )


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
