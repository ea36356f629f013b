"""Bit-compatible hashing / PRNG for deterministic procedural content.

The reference engine seeds all procedural content (sector props, traffic
spawns) from small integer hash chains (reference: sc_world_partition.cpp:34-57
mix32/hashCoordSeed/rand01, sc_paths.cpp:96-104 fnv1a64).  Reproducing those
chains bit-exactly is what makes editor-authored and procedural worlds replay
identically between the reference and this engine (north-star requirement).

Two implementations are provided:
  * host (pure-Python int arithmetic, exact uint32/uint64 semantics) — used by
    the streaming/baking path on CPU, and
  * device (jax.numpy uint32) — used when spawn generation runs inside jit.

`mix32` is the public-domain "lowbias32" integer hash; `fnv1a64` is standard
FNV-1a. Both are published algorithms, re-implemented here.
"""

from __future__ import annotations

import posixpath

import jax.numpy as jnp
import numpy as np

_U32 = 0xFFFFFFFF
_U64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Host (exact integer) versions
# ---------------------------------------------------------------------------

def mix32(x: int) -> int:
    """lowbias32 integer hash (reference: sc_world_partition.cpp:34-42)."""
    x &= _U32
    x ^= x >> 16
    x = (x * 0x7FEB352D) & _U32
    x ^= x >> 15
    x = (x * 0x846CA68B) & _U32
    x ^= x >> 16
    return x


def hash_coord_seed(seed: int, x: int, z: int) -> int:
    """Per-sector seed from world seed + coord (sc_world_partition.cpp:44-51)."""
    h = seed & _U32
    h ^= mix32((x * 73856093) & _U32)
    h ^= mix32((z * 19349663) & _U32)
    h = mix32((h + 0x9E3779B9) & _U32)
    return h


class Rand01:
    """Stateful uniform [0,1] stream matching reference rand01
    (sc_world_partition.cpp:53-57): state = mix32(state + 0x6d2b79f5);
    value = float(state & 0xFFFFFF) / 16777215."""

    __slots__ = ("state",)

    def __init__(self, state: int):
        self.state = state & _U32

    def next(self) -> float:
        self.state = mix32((self.state + 0x6D2B79F5) & _U32)
        return np.float32(self.state & 0x00FFFFFF) / np.float32(16777215.0)

    def next_u32(self) -> int:
        self.state = mix32((self.state + 0x6D2B79F5) & _U32)
        return self.state


def fnv1a64(text: str | bytes) -> int:
    """FNV-1a 64-bit hash (reference: sc_paths.cpp:96-104)."""
    if isinstance(text, str):
        text = text.encode("utf-8")
    h = 1469598103934665603
    for b in text:
        h ^= b
        h = (h * 1099511628211) & _U64
    return h


def normalize_path_for_id(path: str) -> str:
    """Lowercased, lexically-normalized generic path (sc_paths.cpp:80-93)."""
    p = path.replace("\\", "/")
    p = posixpath.normpath(p) if p else p
    if p == ".":
        p = ""
    return p.lower()


def asset_id_from_path(path: str) -> int:
    """AssetId = fnv1a64(normalized path) (sc_world_partition.cpp:64-69)."""
    if not path:
        return 0
    return fnv1a64(normalize_path_for_id(path))


# ---------------------------------------------------------------------------
# Device (jnp.uint32, traceable) versions — identical bit behaviour
# ---------------------------------------------------------------------------

def jmix32(x):
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def jhash_coord_seed(seed, x, z):
    h = jnp.asarray(seed, jnp.uint32)
    h = h ^ jmix32(jnp.asarray(x, jnp.int32).astype(jnp.uint32) * jnp.uint32(73856093))
    h = h ^ jmix32(jnp.asarray(z, jnp.int32).astype(jnp.uint32) * jnp.uint32(19349663))
    h = jmix32(h + jnp.uint32(0x9E3779B9))
    return h


def jrand01(state):
    """Functional step of the rand01 stream: returns (new_state, value)."""
    state = jmix32(jnp.asarray(state, jnp.uint32) + jnp.uint32(0x6D2B79F5))
    value = (state & jnp.uint32(0x00FFFFFF)).astype(jnp.float32) / jnp.float32(16777215.0)
    return state, value
