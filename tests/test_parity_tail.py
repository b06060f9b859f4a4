"""Parity-tail e2e tests: multilinear commit->prove->verify for both codes
(reference: lcpc-brakedown-pc/src/tests.rs:240-288 end_to_end_one_proof_ml,
lcpc-ligero-pc ml tests) and Ft253_192 driven through the full commit and
proof-of-storage flows (reference: proof-of-storage/src/fields/ft253_192.rs
is a first-class PoS field)."""

import random

import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, prove, verify
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63, FT253_192
from lcpc_proof_of_storage_tpu.pos import online
from lcpc_proof_of_storage_tpu.pos.storage import data_bytes_to_limbs_np


def _tensors(spec, x, n_rows, n_per_row):
    """Univariate tensor decomposition (the reference's ML test also uses
    powers of x: tests.rs:258-266 'it doesn't really matter')."""
    inner = [pow(x, j, spec.modulus) for j in range(n_per_row)]
    xr = (x * inner[-1]) % spec.modulus
    outer = [pow(xr, i, spec.modulus) for i in range(n_rows)]
    return outer, inner


def _poly_eval(spec, coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % spec.modulus
    return acc


@pytest.mark.parametrize("lgl", [6, 9])
def test_ligero_ml_end_to_end(lgl):
    """ML constructor drive: 2^lgl monomials, n_rows * n_per_row == 2^lgl
    (tests.rs:251), prove with one enc, verify with new_from_dims enc."""
    spec = FT63
    rnd = random.Random(100 + lgl)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(1 << lgl)]
    enc = LigeroEncoding.new_ml(lgl, spec)
    comm = commit(coeffs, enc)
    assert comm.n_rows * comm.n_per_row == 1 << lgl
    root = comm.get_root().root

    x = rnd.randrange(spec.modulus)
    outer, inner = _tensors(spec, x, comm.n_rows, comm.n_per_row)

    tr1 = Transcript(b"test transcript")
    tr1.append_message(b"polycommit", root)
    pf = prove(comm, outer, enc, tr1)

    enc2 = LigeroEncoding.new_from_dims(comm.n_per_row, comm.n_cols, spec)
    tr2 = Transcript(b"test transcript")
    tr2.append_message(b"polycommit", root)
    res = verify(root, outer, inner, pf, enc2, tr2)
    assert res == _poly_eval(spec, coeffs, x)


@pytest.mark.parametrize("lgl", [6, 9])
def test_brakedown_ml_end_to_end(lgl):
    spec = FT63
    rnd = random.Random(200 + lgl)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(1 << lgl)]
    enc = BrakedownEncoding.new_ml(lgl, 0, spec)
    comm = commit(coeffs, enc)
    assert comm.n_rows * comm.n_per_row == 1 << lgl
    root = comm.get_root().root

    x = rnd.randrange(spec.modulus)
    outer, inner = _tensors(spec, x, comm.n_rows, comm.n_per_row)

    tr1 = Transcript(b"test transcript")
    tr1.append_message(b"polycommit", root)
    pf = prove(comm, outer, enc, tr1)

    enc2 = BrakedownEncoding.new_from_dims(comm.n_per_row, comm.n_cols, 0,
                                           spec)
    tr2 = Transcript(b"test transcript")
    tr2.append_message(b"polycommit", root)
    res = verify(root, outer, inner, pf, enc2, tr2)
    assert res == _poly_eval(spec, coeffs, x)


def test_ft253_commit_prove_verify():
    """Ft253_192 (the 253-bit PoS field) through the full univariate PC
    flow, tamper check included."""
    spec = FT253_192
    rnd = random.Random(7)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(300)]
    enc = LigeroEncoding.new(300, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root

    x = rnd.randrange(spec.modulus)
    outer, inner = _tensors(spec, x, comm.n_rows, comm.n_per_row)
    tr1 = Transcript(b"t")
    tr1.append_message(b"polycommit", root)
    pf = prove(comm, outer, enc, tr1)
    tr2 = Transcript(b"t")
    tr2.append_message(b"polycommit", root)
    assert verify(root, outer, inner, pf, enc, tr2) == \
        _poly_eval(spec, coeffs, x)

    bad_root = bytes([root[0] ^ 1]) + root[1:]
    tr3 = Transcript(b"t")
    tr3.append_message(b"polycommit", root)
    with pytest.raises(Exception):
        verify(bad_root, outer, inner, pf, enc, tr3)


def test_ft253_pos_flow():
    """Ft253_192 through the PoS online flow: commit file data, retrieve
    columns, verify paths + commitment against locally computed leaves."""
    spec = FT253_192
    rnd = random.Random(11)
    data = bytes(rnd.randrange(256) for _ in range(2000))
    n_pre, n_enc = 8, 32

    comm = online.commit_file_data(data, n_pre, n_enc, spec=spec)
    root = comm.get_root().root

    cols_required = online.get_pos_soundness_n_cols(n_pre, n_enc)
    requested = online.get_column_indices_from_random_seed(
        1234, cols_required, comm.n_cols)
    local_leaves = online.leaves_for_file_data(data, n_pre, n_enc, requested,
                                               spec=spec)
    cols = online.server_retrieve_columns(comm, requested)

    online.client_verify_commitment(root, local_leaves, requested, cols,
                                    cols_required, spec=spec)

    # tampered column value must fail
    vals = list(cols[0].col)
    vals[0] = (vals[0] + 1) % spec.modulus
    bad = type(cols[0])(col=vals, path=cols[0].path)
    with pytest.raises(online.VerificationError):
        online.client_verify_commitment(root, local_leaves, requested,
                                        [bad] + cols[1:], cols_required,
                                        spec=spec)


def test_ft253_verifiable_poly_eval():
    """Ft253_192 verifiable polynomial evaluation round trip
    (online.rs verifiable eval family with the 253-bit data field)."""
    spec = FT253_192
    rnd = random.Random(13)
    data = bytes(rnd.randrange(256) for _ in range(1500))
    n_pre, n_enc = 8, 32
    comm = online.commit_file_data(data, n_pre, n_enc, spec=spec)

    point = rnd.randrange(spec.modulus)
    left, right = online.form_side_vectors(point, comm.n_rows,
                                           comm.n_per_row, spec=spec)
    result_vec = online.verifiable_polynomial_evaluation(comm, left,
                                                         spec=spec)
    cols_required = online.get_pos_soundness_n_cols(n_pre, n_enc)
    requested = online.get_column_indices_from_random_seed(
        99, cols_required, comm.n_cols)
    cols = online.server_retrieve_columns(comm, requested)
    online.verify_proper_partial_polynomial_evaluation(
        left, result_vec, requested, cols, spec=spec)

    # the full evaluation equals the host oracle
    limbs = data_bytes_to_limbs_np(data, spec)
    coeffs = [sum(int(x) << (16 * i) for i, x in enumerate(row))
              for row in limbs]
    expect = online.evaluate_field_polynomial_at_point(coeffs, point,
                                                       spec=spec)
    got = online.vector_multiply(online.decode_row(result_vec, spec=spec),
                                 right, spec=spec)
    assert got == expect


def test_streaming_leaves_matches_in_ram(tmp_path):
    """online.streaming_leaves_for_file (constant-memory chunked-upload
    precompute) == leaves_for_file_data (in-RAM commit path), including a
    partial final element and partial final row."""
    import random

    from lcpc_proof_of_storage_tpu.pos import online
    from lcpc_proof_of_storage_tpu.pos.online import POS_FIELD

    rnd = random.Random(77)
    for size in (1, 500, 7 * 8 * 16 + 3, 20_000):
        data = bytes(rnd.randrange(256) for _ in range(size))
        p = tmp_path / f"f{size}.bin"
        p.write_bytes(data)
        n_pre, n_enc = 8, 32
        requested = online.get_column_indices_from_random_seed(
            1337, online.get_pos_soundness_n_cols(n_pre, n_enc), n_enc)
        ref = online.leaves_for_file_data(data, n_pre, n_enc, requested)
        # small batch_rows forces multiple streamed batches
        got = online.streaming_leaves_for_file(p, n_pre, n_enc, requested,
                                               POS_FIELD, batch_rows=4)
        assert got == ref, size
