"""Layer transfer functions (reference: Common/NeuralNet.swift:184-228).

The reference supports the MATLAB nnet subset: TanSig (vvtanhf), LogSig
(1/(1+e^-x) composed from vDSP primitives), PureLin (identity), SatLin
(clip to [0, 1]).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_transfer", "TRANSFER_IMPLS"]


def _tansig(x):
    return jnp.tanh(x)


def _logsig(x):
    # exact composition used by the reference: 1 / (1 + exp(-x))
    # (NeuralNet.swift:196-215)
    return 1.0 / (1.0 + jnp.exp(-x))


def _purelin(x):
    return x


def _satlin(x):
    return jnp.clip(x, 0.0, 1.0)


TRANSFER_IMPLS = {
    "TanSig": _tansig,
    "LogSig": _logsig,
    "PureLin": _purelin,
    "SatLin": _satlin,
}


def apply_transfer(x: jnp.ndarray, name: str) -> jnp.ndarray:
    try:
        return TRANSFER_IMPLS[name](x)
    except KeyError:
        raise ValueError(f"unknown transfer function {name!r}") from None
