"""Cross-chip four-step NTT == single-chip NTT (8-device virtual mesh)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.fields.field import FT63, FT127
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.ntt import ntt
from lcpc_proof_of_storage_tpu.parallel.cross_chip_ntt import cross_chip_ntt
from lcpc_proof_of_storage_tpu.parallel.sharded import make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.mark.parametrize("spec,n", [(FT63, 1024), (FT127, 512)],
                         ids=["ft63_1k", "ft127_512"])
def test_cross_chip_matches_single_chip(mesh, spec, n):
    lf = limb_field(spec)
    rnd = random.Random(n)
    batch = 2
    vals = [[rnd.randrange(spec.modulus) for _ in range(n)] for _ in range(batch)]
    X = jnp.stack([lf.array(v) for v in vals])
    ref = np.asarray(ntt(X, spec))
    got = np.asarray(cross_chip_ntt(X, spec, mesh))
    assert np.array_equal(got, ref)


def test_cross_chip_explicit_split(mesh):
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(5)
    n = 2048
    vals = [rnd.randrange(spec.modulus) for _ in range(n)]
    X = lf.array(vals)[None]
    ref = np.asarray(ntt(X, spec))
    for n1 in (8, 64):
        got = np.asarray(cross_chip_ntt(X, spec, mesh, n1=n1))
        assert np.array_equal(got, ref), f"n1={n1}"


def test_wide_encode_rows(mesh):
    """Cross-chip wide-row Ligero encode == single-chip encode_rows, and the
    column-sharded output hashes to the same commitment leaves."""
    from lcpc_proof_of_storage_tpu.ops.ntt import encode_rows
    from lcpc_proof_of_storage_tpu.ops.blake3_jax import hash_columns
    from lcpc_proof_of_storage_tpu.parallel.cross_chip_ntt import wide_encode_rows
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(6)
    n_per_row, n_cols, b = 256, 1024, 2
    rows = [[rnd.randrange(spec.modulus) for _ in range(n_per_row)]
            for _ in range(b)]
    X = jnp.stack([lf.array(r) for r in rows])
    ref = np.asarray(encode_rows(X, spec, n_cols))
    got = np.asarray(wide_encode_rows(X, spec, n_cols, mesh))
    assert np.array_equal(got, ref)
    h_ref = np.asarray(hash_columns(jnp.asarray(ref), spec))
    h_got = np.asarray(hash_columns(jnp.asarray(got), spec))
    assert np.array_equal(h_got, h_ref)
