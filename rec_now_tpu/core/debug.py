"""Debug-print utilities.

TPU-native replacement for the reference's TF1-compat ``tf.Print`` wrappers
(rec_now/util/tfprint.py:16,49,88 — ``tfprint`` / ``tfprintlist`` /
``tfprint_minmax``, all gated on a ``do_print`` flag).  Built on
``jax.debug.print`` so the prints survive ``jit`` and run on TPU via
outfeed instead of forcing eager mode like the TF1 shim did.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dbg_print(tensor, desc: str = "", do_print: bool = True,
              summarize: int = 32):
    """Print a tensor's shape and (leading) values from inside jit.

    Args:
        tensor: array to print.
        desc: description prefix.
        do_print: static gate; when False this is an identity.
        summarize: max number of leading elements of the flattened
            tensor to print.

    Returns:
        ``tensor`` unchanged (so the call can be threaded into a graph).
    """
    if not do_print:
        return tensor
    flat = jnp.ravel(tensor)[:summarize]
    jax.debug.print(desc + " shape={shape} values={vals}",
                    shape=tensor.shape, vals=flat)
    return tensor


def dbg_minmax(tensor, desc: str = "", do_print: bool = True):
    """Print a tensor's shape, min and max from inside jit.

    Mirrors the reference's ``tfprint_minmax`` (rec_now/util/tfprint.py:88).

    Returns:
        ``tensor`` unchanged.
    """
    if not do_print:
        return tensor
    jax.debug.print(desc + " shape={shape} min={mn} max={mx}",
                    shape=tensor.shape, mn=jnp.min(tensor),
                    mx=jnp.max(tensor))
    return tensor


def dbg_print_list(tensors, desc: str = "", do_print: bool = True,
                   summarize: int = 32):
    """Print a list of tensors (reference: tfprint.py:49 ``tfprintlist``)."""
    if not do_print:
        return tensors
    for i, t in enumerate(tensors):
        dbg_print(t, f"{desc}[{i}]", do_print=True, summarize=summarize)
    return tensors
