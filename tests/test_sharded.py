"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Determinism oracle (SURVEY.md §5 race-detection analogue): same input =>
same root regardless of sharding, and sharded == single-chip bit-exactly.
"""

import random

import jax
import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, _collapse, prove, verify
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63, limbs_to_ints
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.parallel.sharded import (
    make_mesh, sharded_collapse, sharded_commit, training_step,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_commit_matches_single_chip(mesh):
    spec = FT63
    rnd = random.Random(3)
    length = 2000
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new_from_dims(64, 128, spec)
    single = commit(coeffs, enc)
    shard = sharded_commit(coeffs, enc, mesh)
    assert np.array_equal(shard.hashes, single.hashes)
    assert shard.get_root().root == single.get_root().root
    assert np.array_equal(np.asarray(shard.comm), np.asarray(single.comm))


def test_sharded_collapse_matches_host(mesh):
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(4)
    n_rows, n_per_row = 16, 8
    mat = [[rnd.randrange(spec.modulus) for _ in range(n_per_row)]
           for _ in range(n_rows)]
    tensor = [rnd.randrange(spec.modulus) for _ in range(n_rows)]
    cm = jax.numpy.stack([lf.array(r) for r in mat])
    out = sharded_collapse(cm, lf.array(tensor)[:, None, :], spec, mesh)
    got = limbs_to_ints(np.asarray(out))
    expect = [sum(tensor[i] * mat[i][j] for i in range(n_rows)) % spec.modulus
              for j in range(n_per_row)]
    assert got == expect


def test_training_step_runs_sharded(mesh):
    spec = FT63
    lf = limb_field(spec)
    enc = LigeroEncoding.new_from_dims(16, 64, spec)
    step = training_step(enc, mesh)
    n_rows = 16
    coeff = jax.numpy.zeros((n_rows, enc.n_per_row, lf.L), jax.numpy.uint32)
    rand = lf.ones((n_rows,))
    outer = lf.ones((n_rows,))
    comm, leaves, p_random, p_eval = step(coeff, rand, outer)
    jax.block_until_ready((comm, leaves, p_random, p_eval))
    assert leaves.shape == (enc.n_cols, 8)


def test_sharded_brakedown_commit_matches_single_chip(mesh):
    """Brakedown under the mesh: the gather tables ride as replicated jit
    arguments and the irregular codeword length exercises the column-padding
    path (n_cols is never a multiple of the mesh)."""
    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding

    spec = FT63
    rnd = random.Random(11)
    length = 2000
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = BrakedownEncoding.new(length, seed=0, field=spec)
    assert enc.n_cols % 8 != 0  # irregular codeword length on an 8-mesh
    single = commit(coeffs, enc)
    shard = sharded_commit(coeffs, enc, mesh)
    assert np.array_equal(shard.hashes, single.hashes)
    assert np.array_equal(np.asarray(shard.comm), np.asarray(single.comm))


def test_sharded_commit_row_count_not_divisible(mesh):
    """Row padding: n_rows not a multiple of the mesh still hashes only the
    real rows (padded zero rows would change every column digest)."""
    spec = FT63
    rnd = random.Random(12)
    enc = LigeroEncoding.new_from_dims(32, 64, spec)
    length = 32 * 13  # 13 rows on an 8-mesh
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    single = commit(coeffs, enc)
    shard = sharded_commit(coeffs, enc, mesh)
    assert shard.n_rows == 13
    assert np.array_equal(shard.hashes, single.hashes)
    assert np.array_equal(np.asarray(shard.comm), np.asarray(single.comm))


def test_sharded_commit_proves_and_verifies(mesh):
    spec = FT63
    rnd = random.Random(5)
    length = 1000
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = LigeroEncoding.new_from_dims(64, 128, spec)
    comm = sharded_commit(coeffs, enc, mesh)
    root = comm.get_root().root
    x = rnd.randrange(spec.modulus)
    inner = [pow(x, j, spec.modulus) for j in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]
    tr = Transcript(b"t")
    tr.append_message(b"polycommit", root)
    proof = prove(comm, outer, enc, tr)
    tv = Transcript(b"t")
    tv.append_message(b"polycommit", root)
    res = verify(root, outer, inner, proof, enc, tv)
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % spec.modulus
    assert res == expect
