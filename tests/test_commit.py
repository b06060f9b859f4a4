"""End-to-end commitment engine tests over the Ligero encoding.

Reference oracle families (SURVEY.md §4): end_to_end, end_to_end_two_proofs
(transcript-state equality), serde round trip, tamper rejection
(lcpc-2d/src/tests.rs:274-395, networking/tests.rs:696-780).
"""

import random

import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import (
    LcCommit, VerifierError, commit, open_column, prove, verify,
    verify_column_path,
)
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255


def _tensors(spec, x, n_rows, n_per_row):
    """outer = [x^(i*n_per_row)], inner = [x^j]: evaluation of the univariate
    polynomial at point x via the tensor decomposition (reference tests)."""
    inner = [pow(x, j, spec.modulus) for j in range(n_per_row)]
    xr = pow(x, n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(n_rows)]
    return outer, inner


def _poly_eval(spec, coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % spec.modulus
    return acc


@pytest.mark.parametrize("spec,length", [(FT63, 1000), (FT255, 300)],
                         ids=["ft63", "ft255"])
def test_end_to_end(spec, length):
    rnd = random.Random(42)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new(length, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root
    assert len(root) == 32

    x = rnd.randrange(spec.modulus)
    outer, inner = _tensors(spec, x, comm.n_rows, comm.n_per_row)

    tr_p = Transcript(b"test transcript")
    tr_p.append_message(b"polycommit", root)
    tr_p.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
    proof = prove(comm, outer, enc, tr_p)

    tr_v = Transcript(b"test transcript")
    tr_v.append_message(b"polycommit", root)
    tr_v.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
    result = verify(root, outer, inner, proof, enc, tr_v)

    assert result == _poly_eval(spec, coeffs, x)
    # transcript-state equality oracle (tests.rs end_to_end_two_proofs)
    assert tr_p.state_bytes() == tr_v.state_bytes()


def test_two_proofs_transcript_continuity():
    spec = FT63
    rnd = random.Random(1)
    length = 500
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new(length, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root

    tr_p = Transcript(b"test transcript")
    tr_p.append_message(b"polycommit", root)
    tr_v = Transcript(b"test transcript")
    tr_v.append_message(b"polycommit", root)

    for seed in (2, 3):
        x = random.Random(seed).randrange(spec.modulus)
        outer, inner = _tensors(spec, x, comm.n_rows, comm.n_per_row)
        proof = prove(comm, outer, enc, tr_p)
        res = verify(root, outer, inner, proof, enc, tr_v)
        assert res == _poly_eval(spec, coeffs, x)
        assert tr_p.state_bytes() == tr_v.state_bytes()


def test_commit_padding_and_column_open():
    spec = FT63
    rnd = random.Random(5)
    length = 777  # forces row padding
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new(length, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root
    for c in (0, 1, comm.n_cols - 1):
        col = open_column(comm, c)
        assert verify_column_path(col, c, root, spec)
        # wrong index fails
        assert not verify_column_path(col, (c + 1) % comm.n_cols, root, spec)


def test_tampered_proof_rejected():
    spec = FT63
    rnd = random.Random(9)
    length = 400
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new(length, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root
    x = rnd.randrange(spec.modulus)
    outer, inner = _tensors(spec, x, comm.n_rows, comm.n_per_row)

    def fresh_tr():
        t = Transcript(b"test transcript")
        t.append_message(b"polycommit", root)
        return t

    proof = prove(comm, outer, enc, fresh_tr())

    # tamper p_eval
    import copy
    bad = copy.deepcopy(proof)
    bad.p_eval[0] = (bad.p_eval[0] + 1) % spec.modulus
    with pytest.raises(VerifierError):
        verify(root, outer, inner, bad, enc, fresh_tr())

    # tamper a column value
    bad = copy.deepcopy(proof)
    bad.columns[3].col[0] = (bad.columns[3].col[0] + 1) % spec.modulus
    with pytest.raises(VerifierError):
        verify(root, outer, inner, bad, enc, fresh_tr())

    # truncate one Merkle path element (non-32-byte): must fail as
    # ColumnPath, not crash the batched fold with a reshape error
    bad = copy.deepcopy(proof)
    bad.columns[2].path[1] = bad.columns[2].path[1][:31]
    with pytest.raises(VerifierError):
        verify(root, outer, inner, bad, enc, fresh_tr())

    # drop a path level on one column (ragged path lengths)
    bad = copy.deepcopy(proof)
    bad.columns[0].path.pop()
    with pytest.raises(VerifierError):
        verify(root, outer, inner, bad, enc, fresh_tr())

    # non-canonical p_eval value (>= p): the transcript append must refuse
    # it (the reference rejects non-canonical encodings at deserialization)
    bad = copy.deepcopy(proof)
    bad.p_eval[0] = bad.p_eval[0] + spec.modulus
    with pytest.raises((VerifierError, ValueError, OverflowError)):
        verify(root, outer, inner, bad, enc, fresh_tr())

    # tamper the root
    bad_root = bytes([root[0] ^ 1]) + root[1:]
    with pytest.raises(VerifierError):
        tr = Transcript(b"test transcript")
        tr.append_message(b"polycommit", bad_root)
        verify(bad_root, outer, inner, proof, enc, tr)

    # wrong number of columns
    bad = copy.deepcopy(proof)
    bad.columns = bad.columns[:-1]
    with pytest.raises(VerifierError):
        verify(root, outer, inner, bad, enc, fresh_tr())

    # p_random row longer than n_per_row: the reference copies it into an
    # n_cols buffer and the extra coefficient fails the degree test
    # (lib.rs:913-916) — must be a VerifierError, not a numpy shape crash
    bad = copy.deepcopy(proof)
    bad.p_random_vec[0] = bad.p_random_vec[0] + [1]
    with pytest.raises(VerifierError):
        verify(root, outer, inner, bad, enc, fresh_tr())

    # ragged opened-column lengths must be rejected cleanly
    from lcpc_proof_of_storage_tpu.core.commit import LcColumn
    bad = copy.deepcopy(proof)
    bad.columns[1] = LcColumn(col=bad.columns[1].col[:-1],
                              path=bad.columns[1].path)
    with pytest.raises(VerifierError):
        verify(root, outer, inner, bad, enc, fresh_tr())


def test_dims_solver_invariants():
    # reference test: lcpc-ligero-pc/src/tests.rs:22-41
    rnd = random.Random(11)
    for _ in range(64):
        length = rnd.randrange(128, 1 << 16)
        dims = LigeroEncoding._get_dims(length, FT63, (1, 2))
        assert dims is not None
        n_rows, n_per_row, n_cols = dims
        assert n_rows * n_per_row >= length
        assert (n_rows - 1) * n_per_row < length
        assert n_per_row < n_cols
        assert n_cols & (n_cols - 1) == 0


def test_random_size_rho_sweep():
    """Randomized full-protocol sweep: random length and random rate, commit
    -> prove -> verify -> eval check (lcpc-2d/src/tests.rs:415-426:
    len in [2^7, 2^15), rho in (0.1, 0.9)).  Default 4 rounds for CI;
    LCPC_BIG_FUZZ=1 runs the reference's scale."""
    import os
    rounds = 32 if os.environ.get("LCPC_BIG_FUZZ", "") not in ("", "0") else 4
    rnd = random.Random(1414)
    spec = FT63
    for _ in range(rounds):
        length = rnd.randrange(1 << 7, 1 << 12)
        # random rate in (0.1, 0.9) as a small fraction
        den = rnd.randrange(3, 11)
        num = rnd.randrange(max(1, int(den * 0.1) + 1), int(den * 0.9))
        enc = LigeroEncoding.new(length, spec, rho=(num, den))
        coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
        comm = commit(coeffs, enc)
        root = comm.get_root().root
        x = rnd.randrange(spec.modulus)
        outer, inner = _tensors(spec, x, comm.n_rows, comm.n_per_row)

        def fresh_tr():
            tr = Transcript(b"sweep")
            tr.append_message(b"polycommit", root)
            tr.append_message(b"ncols",
                              enc.get_n_col_opens().to_bytes(8, "little"))
            return tr

        proof = prove(comm, outer, enc, fresh_tr())
        got = verify(root, outer, inner, proof, enc, fresh_tr())
        expect = 0
        for c in reversed(coeffs):
            expect = (expect * x + c) % spec.modulus
        assert got == expect, (length, num, den)


def test_commit_deterministic():
    spec = FT63
    coeffs = [(i * 31 + 7) % spec.modulus for i in range(256)]
    enc = LigeroEncoding.new(256, spec)
    r1 = commit(coeffs, enc).get_root().root
    r2 = commit(coeffs, enc).get_root().root
    assert r1 == r2
    coeffs[0] ^= 1
    r3 = commit(coeffs, enc).get_root().root
    assert r3 != r1
