"""Stateless integer hashing for the multi-hash embedding trick.

The reference hashes *strings* through ``keras.layers.Hashing`` (SipHash
on serialized strings, rec_now/layers/multi_hash_layer.py:57).  Strings
are not a TPU datatype; the TPU-native design hashes int ids directly on
device with murmur3-style avalanche mixing, salted per hash function.
The statistical contract is the same — num_hash independent uniform maps
into [0, num_bins) — with zero host round-trips and full jit/vmap/pjit
compatibility.  (Exact bin assignments differ from TF's SipHash; tests
assert distributional properties and determinism instead of TF parity.)

Everything is computed in uint32 (JAX's default x64-disabled mode has no
uint64); 64-bit inputs are folded to 32 bits by xoring their halves
before mixing.
"""
from __future__ import annotations

import jax.numpy as jnp

# murmur3 fmix32 constants (public domain).
_M1 = jnp.uint32(0x85EBCA6B)
_M2 = jnp.uint32(0xC2B2AE35)
_GOLDEN = jnp.uint32(0x9E3779B9)


def _to_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Fold any integer array into uint32."""
    if x.dtype in (jnp.int64, jnp.uint64):
        lo = (x & 0xFFFFFFFF).astype(jnp.uint32)
        hi = (x >> 32).astype(jnp.uint32)
        return lo ^ mix32(hi)
    return x.astype(jnp.uint32)


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 finalizer: uint32 -> well-mixed uint32."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * _M1
    x = x ^ (x >> jnp.uint32(13))
    x = x * _M2
    x = x ^ (x >> jnp.uint32(16))
    return x


# kept under the historical name used across the package
splitmix64 = mix32


def salted_hash(ids: jnp.ndarray, salt: int, num_bins: int) -> jnp.ndarray:
    """Hash int ids into [0, num_bins) with a per-function salt.

    Args:
        ids: integer array of any shape.
        salt: static int salt distinguishing hash functions.
        num_bins: bucket count.

    Returns:
        int32 array of bucket indices, same shape as ``ids``.
    """
    seed = mix32(jnp.uint32(salt & 0xFFFFFFFF))
    h = mix32(_to_u32(jnp.asarray(ids)) ^ seed)
    # second round decorrelates consecutive ids across salts
    h = mix32(h + seed)
    return (h % jnp.uint32(num_bins)).astype(jnp.int32)


def combine_hash(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Order-sensitive combination of two id streams into one id space.

    Used by the cartesian-product layer to fuse id tuples into a single
    crossed id (the reference joins strings with a separator instead,
    rec_now/layers/cartesian_product_layer.py:174).  Boost-style
    hash_combine: not commutative, avalanched.
    """
    a = _to_u32(jnp.asarray(a))
    b = _to_u32(jnp.asarray(b))
    return mix32(a ^ (mix32(b) + _GOLDEN + (a << jnp.uint32(6))
                      + (a >> jnp.uint32(2))))
