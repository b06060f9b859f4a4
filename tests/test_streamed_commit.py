"""Streamed (out-of-core) commit: bit-equality with the one-shot path and
end-to-end prove/verify off a host-resident comm.

Reference scope: the large-n commits of doc/benchmark-results/
20210807_64c_255bit_ligero_dfl.txt:20-24 (2^24..2^29) need out-of-core row
batching on a 16 GB chip; core/streamed.py provides it.  Batch boundaries
exercise every alignment case: 32-byte zero-block prefix, interior
whole-chunk batches, partial final chunk, and W=24 (ft191) where chunk
boundaries are not row-aligned without a 128-row stride.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, prove, verify
from lcpc_proof_of_storage_tpu.core.streamed import _row_batches, commit_streamed
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63, FT191, FT255


@pytest.mark.parametrize("spec,n_rows,n_per_row,n_cols,batch", [
    (FT255, 64, 8, 32, 32),     # W=32: first batch 31 rows, then 32s
    (FT255, 97, 8, 32, 40),     # partial final chunk
    (FT63, 256, 4, 16, 128),    # W=8: first batch 124 rows
    (FT191, 215, 4, 16, 128),   # W=24: chunk boundary not row-aligned
], ids=["ft255", "ft255-partial", "ft63", "ft191"])
def test_streamed_root_matches(spec, n_rows, n_per_row, n_cols, batch):
    rnd = random.Random(11)
    length = n_per_row * (n_rows - 1) + 1 + rnd.randrange(n_per_row - 1)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding(spec, n_per_row, n_cols)
    one = commit(coeffs, enc)
    streamed = commit_streamed(coeffs, enc, target_batch_rows=batch)
    assert np.array_equal(one.hashes, streamed.hashes)
    assert isinstance(streamed.comm, np.ndarray)
    assert np.array_equal(np.asarray(one.comm), streamed.comm)


def test_streamed_synthetic_coeffs_deterministic():
    """SyntheticCoeffs (device-generated bench mode, r5): runs the full
    streamed pipeline without any host coefficient matrix; same seed ->
    same root, different seed -> different root; canonical values only."""
    from lcpc_proof_of_storage_tpu.core.streamed import SyntheticCoeffs
    spec = FT255
    n_rows, n_per_row, n_cols = 64, 8, 32
    length = n_rows * n_per_row
    enc = LigeroEncoding(spec, n_per_row, n_cols)
    c1 = commit_streamed(SyntheticCoeffs(length, seed=3), enc,
                         target_batch_rows=32, keep_comm=False)
    c2 = commit_streamed(SyntheticCoeffs(length, seed=3), enc,
                         target_batch_rows=32, keep_comm=False)
    c3 = commit_streamed(SyntheticCoeffs(length, seed=4), enc,
                         target_batch_rows=32, keep_comm=False)
    assert c1.coeffs is None and c1.comm is None
    assert c1.get_root().root == c2.get_root().root
    assert c1.get_root().root != c3.get_root().root


def test_row_batches_alignment():
    for W in (8, 16, 24, 32):
        for n_rows in (1, 7, 64, 97, 215, 501):
            batches = _row_batches(n_rows, W, 64)
            assert batches[0][0] == 0 and batches[-1][1] == n_rows
            for (a, b), (c, d) in zip(batches, batches[1:]):
                assert b == c
            for _, end in batches[:-1]:
                assert (32 + end * W) % 1024 == 0, (W, n_rows, end)


def test_streamed_prove_verify():
    spec = FT255
    rnd = random.Random(5)
    n_rows, n_per_row, n_cols = 64, 8, 32
    length = n_per_row * n_rows
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding(spec, n_per_row, n_cols)
    comm = commit_streamed(coeffs, enc, target_batch_rows=32)
    root = comm.get_root().root

    x = rnd.randrange(spec.modulus)
    inner = [pow(x, i, spec.modulus) for i in range(n_per_row)]
    outer = [pow(x, n_per_row * i, spec.modulus) for i in range(n_rows)]

    def tr():
        t = Transcript(b"test transcript")
        t.append_message(b"polycommit", root)
        t.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return t

    proof = prove(comm, outer, enc, tr())
    got = verify(root, outer, inner, proof, enc, tr())
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % spec.modulus
    assert got == expect


def test_streamed_host_coeffs():
    """device_coeffs=False (2^27+ regime): coefficients live in host RAM as
    uint16 limbs, uploaded per batch — root, comm, and prove/verify must
    match the device-resident path."""
    from lcpc_proof_of_storage_tpu.fields.field import ints_to_limbs

    spec = FT255
    rnd = random.Random(21)
    n_rows, n_per_row, n_cols = 64, 8, 32
    coeffs = [rnd.randrange(spec.modulus) for _ in range(n_per_row * n_rows)]
    enc = LigeroEncoding(spec, n_per_row, n_cols)
    dev = commit_streamed(coeffs, enc, target_batch_rows=32)
    limb_arr = ints_to_limbs(coeffs, spec)
    host = commit_streamed(limb_arr, enc, target_batch_rows=32,
                           device_coeffs=False)
    assert np.array_equal(dev.hashes, host.hashes)
    assert np.array_equal(dev.comm, host.comm)

    root = host.get_root().root
    x = rnd.randrange(spec.modulus)
    inner = [pow(x, i, spec.modulus) for i in range(n_per_row)]
    outer = [pow(x, n_per_row * i, spec.modulus) for i in range(n_rows)]

    def tr():
        t = Transcript(b"test transcript")
        t.append_message(b"polycommit", root)
        t.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return t

    proof = prove(host, outer, enc, tr())
    got = verify(root, outer, inner, proof, enc, tr())
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % spec.modulus
    assert got == expect


def test_streamed_brakedown_matches():
    """commit_streamed is code-agnostic: Brakedown (irregular n_cols, tall
    matrices only at large n — reference 2^29 has ~570 rows) roots must be
    bit-equal to the one-shot path."""
    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
    from lcpc_proof_of_storage_tpu.ops.expander import SDIG_CODE_3, ExpanderEncoder

    spec = FT63
    rnd = random.Random(31)
    enc = BrakedownEncoding(ExpanderEncoder(32, 0, spec, SDIG_CODE_3))
    length = 32 * 300                   # 300 rows -> 3 chunks at W=8
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    one = commit(coeffs, enc)
    streamed = commit_streamed(coeffs, enc, target_batch_rows=128)
    assert np.array_equal(one.hashes, streamed.hashes)


def test_streamed_keep_comm_false_prove_verify():
    """Out-of-core prove: a root-only (keep_comm=False) streamed commitment
    re-encodes the challenged columns on demand (core/streamed.py
    open_columns_streamed) and collapses in row batches — the proof must be
    bit-identical to the one a full commitment produces.  Reference
    capability matched: lcpc-2d/src/lib.rs:1034-1123 proving at 2^25-2^29
    where `comm` lives in 256 GB host RAM."""
    spec = FT255
    rnd = random.Random(9)
    n_rows, n_per_row, n_cols = 256, 8, 32
    enc = LigeroEncoding(spec, n_per_row, n_cols)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(n_per_row * n_rows)]
    one = commit(coeffs, enc)
    slim = commit_streamed(coeffs, enc, target_batch_rows=96, keep_comm=False)
    assert np.array_equal(one.hashes, slim.hashes)
    assert slim.comm is None
    root = slim.get_root().root

    x = rnd.randrange(spec.modulus)
    inner = [pow(x, i, spec.modulus) for i in range(n_per_row)]
    outer = [pow(x, n_per_row * i, spec.modulus) for i in range(n_rows)]

    def tr():
        t = Transcript(b"test transcript")
        t.append_message(b"polycommit", root)
        t.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return t

    # small batches force multi-batch collapse accumulation + column opening
    import os
    os.environ["LCPC_STREAM_BATCH_BYTES"] = str(96 * n_cols * 16 * 4)
    try:
        slim_proof = prove(slim, outer, enc, tr())
    finally:
        del os.environ["LCPC_STREAM_BATCH_BYTES"]
    full_proof = prove(one, outer, enc, tr())
    assert slim_proof.p_eval == full_proof.p_eval
    assert slim_proof.p_random_vec == full_proof.p_random_vec
    assert [c.col for c in slim_proof.columns] == \
           [c.col for c in full_proof.columns]
    assert [c.path for c in slim_proof.columns] == \
           [c.path for c in full_proof.columns]

    got = verify(root, outer, inner, slim_proof, enc, tr())
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % spec.modulus
    assert got == expect


def test_streamed_keep_comm_device_prove_verify():
    """keep_comm="device": the encoded matrix stays device-resident as
    uint16 and prove() serves columns + Merkle paths from it in one fused
    gather (no re-encode).  Proof must be bit-identical to the one-shot
    commitment's."""
    spec = FT255
    rnd = random.Random(10)
    n_rows, n_per_row, n_cols = 256, 8, 32
    enc = LigeroEncoding(spec, n_per_row, n_cols)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(n_per_row * n_rows)]
    one = commit(coeffs, enc)
    dev = commit_streamed(coeffs, enc, target_batch_rows=96,
                          keep_comm="device")
    assert np.array_equal(one.hashes, dev.hashes)
    assert dev.comm is not None and dev.comm.dtype == jnp.uint16
    assert np.array_equal(np.asarray(dev.comm, np.uint32),
                          np.asarray(one.comm))
    root = dev.get_root().root

    x = rnd.randrange(spec.modulus)
    inner = [pow(x, i, spec.modulus) for i in range(n_per_row)]
    outer = [pow(x, n_per_row * i, spec.modulus) for i in range(n_rows)]

    def tr():
        t = Transcript(b"test transcript")
        t.append_message(b"polycommit", root)
        t.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return t

    dev_proof = prove(dev, outer, enc, tr())
    full_proof = prove(one, outer, enc, tr())
    assert dev_proof.p_eval == full_proof.p_eval
    assert [c.col for c in dev_proof.columns] == \
           [c.col for c in full_proof.columns]
    assert [c.path for c in dev_proof.columns] == \
           [c.path for c in full_proof.columns]
    got = verify(root, outer, inner, dev_proof, enc, tr())
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % spec.modulus
    assert got == expect


def test_streamed_device_coeffs_packed_uint16():
    """The bench path: device-resident PACKED uint16 limb coefficients with
    device_coeffs=True, including a non-multiple length (exercises the
    uint16 padding branch in _coeffs_to_matrix) and the total_chunks<2
    one-shot fallback — roots must match the int-list commit."""
    import jax.numpy as jnp

    from lcpc_proof_of_storage_tpu.fields.field import ints_to_limbs

    spec = FT255
    rnd = random.Random(33)
    n_per_row, n_cols = 8, 32
    for n_rows in (64, 1):              # 1 row -> single chunk fallback
        length = n_per_row * (n_rows - 1) + max(1, n_per_row - 3)
        coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
        enc = LigeroEncoding(spec, n_per_row, n_cols)
        one = commit(coeffs, enc)
        packed = jnp.asarray(ints_to_limbs(coeffs, spec).astype(np.uint16))
        streamed = commit_streamed(packed, enc, target_batch_rows=32)
        assert np.array_equal(one.hashes, streamed.hashes)
        assert np.array_equal(np.asarray(one.comm), streamed.comm)
