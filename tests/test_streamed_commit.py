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


def test_streamed_keep_comm_false():
    spec = FT63
    rnd = random.Random(9)
    enc = LigeroEncoding(spec, 4, 16)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(4 * 256)]
    one = commit(coeffs, enc)
    slim = commit_streamed(coeffs, enc, target_batch_rows=128, keep_comm=False)
    assert np.array_equal(one.hashes, slim.hashes)
    assert slim.comm is None
    with pytest.raises(Exception, match="no encoded matrix"):
        prove(slim, [1] * slim.n_rows, enc, Transcript(b"t"))
