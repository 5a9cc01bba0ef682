"""Deterministic string seeding.

The reference seeds its ChaCha20 RNG from a Blake2b-256 hash of a seed string
(reference examples/nqueens/src/main.rs:28-33 and
examples/employee-scheduling/src/lib.rs:50-55).  We keep the same scheme —
any string, hashed with blake2b-256 — and derive a JAX PRNG key from the
digest, so runs are reproducible from the same human-readable seed.
"""

from __future__ import annotations

import hashlib

import jax


def hash_str(seed: str) -> bytes:
    """blake2b-256 digest of the seed string (32 bytes)."""
    return hashlib.blake2b(seed.encode("utf-8"), digest_size=32).digest()


def seed_string_to_key(seed: str) -> jax.Array:
    """Derive a JAX PRNG key from an arbitrary seed string.

    Uses the first 8 bytes of the blake2b-256 digest as the integer seed.
    """
    digest = hash_str(seed)
    seed_int = int.from_bytes(digest[:8], "little") & 0x7FFF_FFFF_FFFF_FFFF
    return jax.random.key(seed_int)
