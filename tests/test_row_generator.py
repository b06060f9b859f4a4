"""Streaming-equivalence oracle: iterator pipeline == in-RAM commit
(reference: row_generator_iter.rs:188-364)."""

import random

import numpy as np

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, open_column
from lcpc_proof_of_storage_tpu.fields.field import WRITEABLE_FT63
from lcpc_proof_of_storage_tpu.pos.row_generator import RowGenerator

SPEC = WRITEABLE_FT63


def _setup(seed=0, n=333, n_pre=8, n_enc=32):
    rnd = random.Random(seed)
    vals = [rnd.randrange(SPEC.modulus) for _ in range(n)]
    enc = LigeroEncoding.new_from_dims(n_pre, n_enc, SPEC)
    comm = commit(vals, enc)
    return vals, comm


def test_streamed_root_equals_commit_root():
    vals, comm = _setup()
    gen = RowGenerator(vals, 8, 32, SPEC)
    assert gen.convert_to_commit_root() == comm.get_root().root


def test_streamed_digests_match_commit_leaves():
    vals, comm = _setup(seed=1)
    digests = RowGenerator(vals, 8, 32, SPEC).get_column_digests()
    expect = [np.asarray(comm.hashes[i], dtype="<u4").tobytes()
              for i in range(32)]
    assert digests == expect
    some = [1, 7, 30]
    got = RowGenerator(vals, 8, 32, SPEC).get_specified_column_digests(some)
    assert got == [expect[c] for c in some]


def test_streamed_full_columns_match_open_column():
    vals, comm = _setup(seed=2)
    cols = [0, 5, 31]
    got = RowGenerator(vals, 8, 32, SPEC).get_full_columns(cols)
    for k, c in enumerate(cols):
        ref = open_column(comm, c)
        assert got[k].col == ref.col
        assert got[k].path == ref.path
