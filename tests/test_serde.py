"""Serialization round trips for proof objects (reference oracle:
lcpc-2d/src/tests.rs:274-315 end_to_end round-trips proof and root through
bincode)."""

import random

import pytest

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, prove, verify
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63
from lcpc_proof_of_storage_tpu.utils import serde


def test_proof_and_root_roundtrip_through_serde():
    spec = FT63
    rnd = random.Random(21)
    length = 300
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new(length, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root

    x = rnd.randrange(spec.modulus)
    inner = [pow(x, j, spec.modulus) for j in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]

    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    proof = prove(comm, outer, enc, tr)

    # binary round trip
    blob = serde.serialize_proof(proof, spec)
    proof2 = serde.deserialize_proof(blob, spec)
    root2 = serde.deserialize_root(serde.serialize_root(root))
    assert root2 == root

    tr_v = Transcript(b"test transcript")
    tr_v.append_message(b"polycommit", root2)
    res = verify(root2, outer, inner, proof2, enc, tr_v)
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % spec.modulus
    assert res == expect

    # JSON round trip
    proof3 = serde.proof_from_json(serde.proof_to_json(proof, spec), spec)
    tr_v2 = Transcript(b"test transcript")
    tr_v2.append_message(b"polycommit", root)
    assert verify(root, outer, inner, proof3, enc, tr_v2) == expect


def test_verify_packed_staging_fast_path_fires():
    """verify() must consume the deserialized proof's packed column array
    without materializing any column's python ints — the ragged-length
    check reads len(c), not len(c.col) (regression: r4 advisor finding)."""
    spec = FT63
    rnd = random.Random(22)
    length = 300
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new(length, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root

    x = rnd.randrange(spec.modulus)
    inner = [pow(x, j, spec.modulus) for j in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]

    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    proof = prove(comm, outer, enc, tr)
    proof2 = serde.deserialize_proof(serde.serialize_proof(proof, spec), spec)
    assert getattr(proof2, "_cols_packed", None) is not None

    tr_v = Transcript(b"test transcript")
    tr_v.append_message(b"polycommit", root)
    verify(root, outer, inner, proof2, enc, tr_v)
    assert all(c._col is None for c in proof2.columns), \
        "verify materialized column ints; packed fast path did not fire"


def test_deserialize_proof_bounds_untrusted_column_count():
    """A tiny proof blob declaring a huge opened-column count must be
    rejected before any allocation (r4 advisor finding)."""
    spec = FT63
    rnd = random.Random(23)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(300)]
    enc = LigeroEncoding.new(300, spec)
    comm = commit(coeffs, enc)
    outer = [1] * comm.n_rows
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", comm.get_root().root)
    proof = prove(comm, outer, enc, tr)
    blob = bytearray(serde.serialize_proof(proof, spec))

    # locate the ncols_open u64: n_cols, p_eval vec, ndt, vecs, then count
    import io
    buf = io.BytesIO(bytes(blob))
    serde.read_u64(buf)
    serde.read_field_vec(buf, spec)
    ndt = serde.read_u64(buf)
    for _ in range(ndt):
        serde.read_field_vec(buf, spec)
    off = buf.tell()
    blob[off:off + 8] = (1 << 40).to_bytes(8, "little")
    with pytest.raises(ValueError, match="more columns"):
        serde.deserialize_proof(bytes(blob), spec)


def test_commit_serde_roundtrip():
    spec = FT63
    coeffs = [(i * 7 + 3) % spec.modulus for i in range(128)]
    enc = LigeroEncoding.new(128, spec)
    comm = commit(coeffs, enc)
    blob = serde.serialize_commit(comm, spec)
    comm2 = serde.deserialize_commit(blob, spec)
    assert comm2.n_rows == comm.n_rows
    assert comm2.get_root().root == comm.get_root().root
    import numpy as np
    assert np.array_equal(np.asarray(comm2.comm), np.asarray(comm.comm))


def test_non_canonical_rejected():
    import io
    spec = FT63
    buf = io.BytesIO(spec.modulus.to_bytes(8, "little"))
    with pytest.raises(ValueError):
        serde.read_field(buf, spec)
