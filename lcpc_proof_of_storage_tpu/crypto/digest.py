"""Digest genericity for the polynomial commitment.

lcpc-2d is generic over the digest (`LcCommit<D, E>`,
/root/reference/lcpc-2d/src/lib.rs:174-191); the reference's committed
microbenchmarks also ran Blake2b (doc/benchmark-results/
sdig-ligero-isz-microbenchmarks).  Blake3 is THE production digest here,
with fused device kernels (ops/blake3_jax, ops/blake3_pallas) — any other
digest hashes on the HOST while the encode stays on device.  That
narrowing (device hashing is Blake3-only) is intentional and documented
in PARITY.md.

A digest must produce 32-byte outputs (the wire format, Merkle array
layout, and serde fixed-width paths all assume 32-byte digests, as the
reference's `Output<D>` instantiations do).
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..fields.field import FieldSpec


class HostDigest:
    """A 32-byte-output digest computed on the host."""

    def __init__(self, name: str, fn, many_fn=None):
        self.name = name
        self._fn = fn
        self._many_fn = many_fn

    def hash(self, msg: bytes) -> bytes:
        out = self._fn(msg)
        assert len(out) == 32
        return out

    def hash_many(self, msgs: np.ndarray) -> np.ndarray:
        """(k, n) uint8 equal-length messages -> (k, 32) uint8 digests.
        Uses the digest's native batch path when available (one C call,
        OpenMP across messages) — the python loop was the r4 bench-scale
        blocker for non-Blake3 digests."""
        if self._many_fn is not None:
            out = self._many_fn(msgs)
            if out is not None:
                return out
        k = msgs.shape[0]
        out = np.empty((k, 32), np.uint8)
        for i in range(k):
            out[i] = np.frombuffer(self._fn(msgs[i].tobytes()), np.uint8)
        return out


def _blake3_host(msg: bytes) -> bytes:
    from .blake3_ref import blake3
    return blake3(msg)


def _blake2b_many(msgs):
    from ..native import blake2b_many_native
    return blake2b_many_native(msgs)


def _blake3_many(msgs):
    from ..native import blake3_many_native
    return blake3_many_native(msgs)


BLAKE2B = HostDigest("blake2b",
                     lambda m: hashlib.blake2b(m, digest_size=32).digest(),
                     many_fn=_blake2b_many)
BLAKE3_HOST = HostDigest("blake3", _blake3_host, many_fn=_blake3_many)

_DIGESTS = {"blake2b": BLAKE2B, "blake3": BLAKE3_HOST}


def get_digest(name: str) -> HostDigest:
    try:
        return _DIGESTS[name]
    except KeyError:
        raise ValueError(f"unknown digest {name!r}; have {sorted(_DIGESTS)}")


def limbs_to_repr_bytes(limbs: np.ndarray, spec: FieldSpec) -> np.ndarray:
    """(..., L) uint32 limbs -> (..., W) uint8 canonical repr bytes
    (little-endian 16-bit limb buffer; BE fields byte-reverse per value)."""
    le = np.empty(limbs.shape[:-1] + (spec.repr_bytes,), np.uint8)
    for i in range(spec.num_limbs16):
        le[..., 2 * i] = limbs[..., i] & 0xFF
        le[..., 2 * i + 1] = (limbs[..., i] >> 8) & 0xFF
    if spec.endianness == "big":
        le = le[..., ::-1]
    return np.ascontiguousarray(le)


def column_leaves_host(comm_np: np.ndarray, spec: FieldSpec,
                       d: HostDigest) -> np.ndarray:
    """(rows, n_cols, L) limbs -> (n_cols, 32) uint8 leaf digests of
    H(0^32 || column reprs) — the generic-digest analogue of the device
    column hash (lcpc-2d/src/lib.rs:752-763)."""
    rows, n_cols, _ = comm_np.shape
    reprs = limbs_to_repr_bytes(np.asarray(comm_np, np.uint32), spec)
    by_col = np.ascontiguousarray(
        reprs.transpose(1, 0, 2)).reshape(n_cols, rows * spec.repr_bytes)
    msgs = np.concatenate(
        [np.zeros((n_cols, 32), np.uint8), by_col], axis=1)
    return d.hash_many(msgs)


def merkle_tree_host(leaves: np.ndarray, n_cols: int,
                     d: HostDigest) -> np.ndarray:
    """Merkle array from (n_cols, 32) uint8 leaves with the reference's
    layout and zero-digest padding (lib.rs:685-694): [leaves padded to
    np2] ++ layers ++ [root], as (2*np2-1, 8) uint32 LE words (the same
    storage form merkle_tree_device produces)."""
    np2 = 1 if n_cols <= 1 else 1 << (n_cols - 1).bit_length()
    cur = np.zeros((np2, 32), np.uint8)
    cur[:n_cols] = leaves
    layers = [cur]
    while cur.shape[0] > 1:
        pairs = cur.reshape(cur.shape[0] // 2, 64)
        cur = d.hash_many(pairs)
        layers.append(cur)
    arr = np.concatenate(layers, axis=0)
    return np.ascontiguousarray(arr).view("<u4").reshape(-1, 8).astype(
        np.uint32)
