"""Digest genericity (lcpc-2d LcCommit<D, E>, lib.rs:174-191): commit /
prove / verify with Blake2b — the second digest the reference's committed
microbenches exercised.  Host hashing path; blake3 stays the fused-device
default (see crypto/digest.py)."""

import hashlib
import random

import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import (
    VerifierError, commit, open_column, prove, verify, verify_column_path)
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63


def _setup(digest):
    spec = FT63
    n = 1 << 10
    enc = LigeroEncoding.new(n, spec, rho=(1, 4))
    rnd = random.Random(42)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(n)]
    comm = commit(coeffs, enc, digest=digest)
    root = comm.get_root().root
    x = 0xABCDEF
    inner = [pow(x, i, spec.modulus) for i in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]

    def tr():
        t = Transcript(b"digest test")
        t.append_message(b"polycommit", root)
        t.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return t

    return spec, enc, comm, root, inner, outer, tr


def test_blake2b_roundtrip_and_root_binding():
    spec, enc, comm, root, inner, outer, tr = _setup("blake2b")
    proof = prove(comm, outer, enc, tr())
    res = verify(root, outer, inner, proof, enc, tr(), digest="blake2b")
    want = 0
    for t, e in zip(inner, proof.p_eval):
        want = (want + t * e) % spec.modulus
    assert res == want
    # the root binds the digest: blake3 and blake2b commits differ
    _, _, comm3, root3, *_ = _setup("blake3")
    assert root3 != root
    # verifying a blake2b proof as blake3 fails on the path check
    with pytest.raises(VerifierError):
        verify(root, outer, inner, proof, enc, tr(), digest="blake3")


def test_blake2b_leaf_matches_hashlib():
    spec, enc, comm, root, inner, outer, tr = _setup("blake2b")
    col = open_column(comm, 3)
    msg = b"\x00" * 32 + b"".join(spec.to_repr(v) for v in col.col)
    leaf = hashlib.blake2b(msg, digest_size=32).digest()
    # fold the stored path by hand and compare to the commitment root
    h, c = leaf, 3
    for p in col.path:
        h = (hashlib.blake2b(h + p, digest_size=32).digest() if c % 2 == 0
             else hashlib.blake2b(p + h, digest_size=32).digest())
        c >>= 1
    assert h == root
    assert verify_column_path(col, 3, root, spec, digest="blake2b")
    assert not verify_column_path(col, 3, root, spec, digest="blake3")


def test_blake2b_tamper_detected():
    spec, enc, comm, root, inner, outer, tr = _setup("blake2b")
    proof = prove(comm, outer, enc, tr())
    bad = proof.columns[0]
    bad.col[0] = (bad.col[0] + 1) % spec.modulus
    with pytest.raises(VerifierError):
        verify(root, outer, inner, proof, enc, tr(), digest="blake2b")


def test_unknown_digest_rejected():
    with pytest.raises(ValueError):
        _setup("md5")


def test_native_blake2b_matches_hashlib():
    """pos_blake2b_many == hashlib.blake2b(digest_size=32) across block
    boundary lengths (the r5 native batch path)."""
    import hashlib

    import numpy as np

    from lcpc_proof_of_storage_tpu.native import blake2b_many_native

    for msg_len in (0, 1, 64, 127, 128, 129, 256, 1000):
        k = 7
        rng = np.random.default_rng(msg_len + 1)
        msgs = rng.integers(0, 256, size=(k, msg_len), dtype=np.uint8)
        got = blake2b_many_native(msgs)
        if got is None:
            import pytest
            pytest.skip("native lib unavailable")
        for i in range(k):
            ref = hashlib.blake2b(msgs[i].tobytes(), digest_size=32).digest()
            assert got[i].tobytes() == ref, msg_len


def test_hash_many_native_batch_agrees_with_loop():
    import numpy as np

    from lcpc_proof_of_storage_tpu.crypto.digest import get_digest

    d = get_digest("blake2b")
    rng = np.random.default_rng(3)
    msgs = rng.integers(0, 256, size=(33, 96), dtype=np.uint8)
    batch = d.hash_many(msgs)
    for i in range(33):
        assert batch[i].tobytes() == d.hash(msgs[i].tobytes())
