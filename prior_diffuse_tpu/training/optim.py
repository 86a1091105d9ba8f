"""Optimizers with torch-Adam semantics.

The reference uses ``torch.optim.Adam(lr, weight_decay=l2)`` — L2 decay
added to the *gradient* before the Adam moments (not AdamW).  The optax
equivalent is ``add_decayed_weights`` ahead of ``scale_by_adam``.  The
learning rate lives in ``opt_state.hyperparams['lr']`` (via
``inject_hyperparams``) so the plateau controller can halve it in place,
mirroring the reference's optimizer-state surgery
(``trainer/complex_ddpm_trainer.py:594-609``).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


@optax.inject_hyperparams
def _torch_adam(lr, l2):
    return optax.chain(
        optax.add_decayed_weights(l2),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),
        optax.scale_by_learning_rate(lr, flip_sign=False),
    )


def torch_adam(lr: float, l2: float = 0.0) -> optax.GradientTransformation:
    return _torch_adam(lr=lr, l2=l2)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["lr"])


def set_lr(opt_state, lr: float):
    """Return a new opt_state with the learning rate replaced."""
    hyper = dict(opt_state.hyperparams)
    hyper["lr"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyper)
