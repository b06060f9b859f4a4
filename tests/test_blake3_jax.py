"""Vectorized Blake3 kernel vs the pure-Python spec reference."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.crypto.blake3_ref import blake3
from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255, FT253_192
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.blake3_jax import (
    blake3_batch_words, digests_to_bytes, digest_to_bytes, hash_columns,
    hash_field_vec, limbs_to_repr_words, merkle_parents,
)


def _words(data: bytes) -> np.ndarray:
    padded = data.ljust((len(data) + 3) // 4 * 4, b"\x00")
    return np.frombuffer(padded, dtype="<u4").astype(np.uint32)


@pytest.mark.parametrize("msg_len", [1, 63, 64, 65, 1024, 1025, 2048, 5000])
def test_blake3_batch_matches_reference(msg_len):
    rnd = random.Random(msg_len)
    msgs = [bytes(rnd.randrange(256) for _ in range(msg_len)) for _ in range(4)]
    arr = jnp.asarray(np.stack([_words(m) for m in msgs]))
    out = jax.jit(lambda x: blake3_batch_words(x, msg_len))(arr)
    got = digests_to_bytes(np.asarray(out))
    assert got == [blake3(m) for m in msgs]


@pytest.mark.parametrize("spec", [FT63, FT255, FT253_192], ids=lambda s: s.name)
def test_repr_words_match_host(spec):
    lf = limb_field(spec)
    rnd = random.Random(1)
    vals = [rnd.randrange(spec.modulus) for _ in range(10)]
    words = np.asarray(limbs_to_repr_words(lf.array(vals), spec), dtype="<u4")
    for i, v in enumerate(vals):
        assert words[i].tobytes() == spec.to_repr(v)


@pytest.mark.parametrize("spec,n_rows", [(FT63, 3), (FT63, 200), (FT255, 40)],
                         ids=["ft63small", "ft63multichunk", "ft255"])
def test_hash_columns_matches_reference(spec, n_rows):
    # column hash = blake3(32 zero bytes || column reprs), lcpc-2d lib.rs:752-753
    lf = limb_field(spec)
    rnd = random.Random(2)
    n_cols = 8
    vals = [[rnd.randrange(spec.modulus) for _ in range(n_cols)] for _ in range(n_rows)]
    comm = jnp.stack([lf.array(r) for r in vals])       # (rows, cols, L)
    digests = digests_to_bytes(np.asarray(jax.jit(lambda c: hash_columns(c, spec))(comm)))
    for col in range(n_cols):
        msg = b"\x00" * 32 + b"".join(spec.to_repr(vals[r][col]) for r in range(n_rows))
        assert digests[col] == blake3(msg)


def test_hash_field_vec():
    spec = FT63
    lf = limb_field(spec)
    vals = [123, 456, 789]
    d = digest_to_bytes(np.asarray(hash_field_vec(lf.array(vals), spec)))
    msg = b"\x00" * 32 + b"".join(spec.to_repr(v) for v in vals)
    assert d == blake3(msg)


def test_merkle_parents_match_reference():
    rnd = random.Random(3)
    leaves = [bytes(rnd.randrange(256) for _ in range(32)) for _ in range(8)]
    arr = jnp.asarray(np.stack([np.frombuffer(l, dtype="<u4") for l in leaves]).astype(np.uint32))
    parents = digests_to_bytes(np.asarray(merkle_parents(arr)))
    for i in range(4):
        assert parents[i] == blake3(leaves[2 * i] + leaves[2 * i + 1])


def test_hash_columns_pallas_matches(monkeypatch):
    """Pallas column-hash kernel == XLA hash_columns (interpret mode)."""
    import jax
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import lcpc_proof_of_storage_tpu.ops.blake3_pallas as bp
    bp._hash_call.cache_clear()
    rnd = random.Random(4)
    spec = FT63
    lf = limb_field(spec)
    # interpret mode is too slow for multi-chunk columns; the chunk-tree
    # merge path is validated on real TPU (scripts/tpu_validate_bench.py)
    n_rows, n_cols = 3, 256
    vals = [[rnd.randrange(spec.modulus) for _ in range(n_cols)]
            for _ in range(n_rows)]
    comm = jnp.stack([lf.array(r) for r in vals])
    ref = np.asarray(hash_columns(comm, spec))
    got = np.asarray(bp.hash_columns_pallas(comm, spec))
    bp._hash_call.cache_clear()
    assert np.array_equal(got, ref)


def test_hash_columns_split_tail_matches(monkeypatch):
    """Non-tile-multiple widths: pallas prefix + XLA tail == full oracle."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import lcpc_proof_of_storage_tpu.ops.blake3_pallas as bp
    bp._hash_call.cache_clear()
    rnd = random.Random(9)
    spec = FT63
    lf = limb_field(spec)
    n_rows, n_cols = 3, 256 + 37          # irregular Brakedown-style width
    vals = [[rnd.randrange(spec.modulus) for _ in range(n_cols)]
            for _ in range(n_rows)]
    comm = jnp.stack([lf.array(r) for r in vals])
    ref = np.asarray(hash_columns(comm, spec))
    main = 256
    head = np.asarray(bp.hash_columns_pallas(comm[:, :main, :], spec))
    tail = np.asarray(hash_columns(comm[:, main:, :], spec))
    bp._hash_call.cache_clear()
    assert np.array_equal(np.concatenate([head, tail], axis=0), ref)
