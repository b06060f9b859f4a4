"""NTT kernel tests: roundtrip, naive-DFT oracle, linearity, batching.

Oracle family (a) of SURVEY.md §4: parallel kernels vs serial references
(reference tests: lcpc-2d/src/tests.rs eval_outer_fft / iNTT identities).
"""

import random

import jax
import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255, limbs_to_ints
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.ntt import ntt, intt, encode_rows, decode_rows


@pytest.mark.parametrize("spec", [FT63, FT255], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [4, 32, 256])
def test_ntt_matches_naive_dft(spec, n):
    lf = limb_field(spec)
    rnd = random.Random(n)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(n)]
    Y = jax.jit(lambda x: ntt(x, spec))(lf.array(coeffs)[None])
    w = spec.nth_root_of_unity(n)
    naive = [
        sum(c * pow(w, (i * j) % n, spec.modulus) for j, c in enumerate(coeffs))
        % spec.modulus
        for i in range(n)
    ]
    assert limbs_to_ints(np.asarray(Y)[0]) == naive


@pytest.mark.parametrize("spec", [FT63, FT255], ids=lambda s: s.name)
def test_ntt_roundtrip(spec):
    lf = limb_field(spec)
    rnd = random.Random(7)
    n, batch = 64, 5
    coeffs = [[rnd.randrange(spec.modulus) for _ in range(n)] for _ in range(batch)]
    X = jax.numpy.stack([lf.array(row) for row in coeffs])
    back = jax.jit(lambda x: intt(ntt(x, spec), spec))(X)
    for i in range(batch):
        assert limbs_to_ints(np.asarray(back)[i]) == coeffs[i]


def test_ntt_linearity():
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(9)
    n = 32
    a = [rnd.randrange(spec.modulus) for _ in range(n)]
    b = [rnd.randrange(spec.modulus) for _ in range(n)]
    A, B = lf.array(a)[None], lf.array(b)[None]
    lhs = ntt(lf.add(A, B), spec)
    rhs = lf.add(ntt(A, spec), ntt(B, spec))
    assert limbs_to_ints(np.asarray(lhs)[0]) == limbs_to_ints(np.asarray(rhs)[0])


def test_encode_decode_rows():
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(11)
    n_per_row, n_cols, batch = 24, 64, 3   # non-power-of-2 n_per_row
    rows = [[rnd.randrange(spec.modulus) for _ in range(n_per_row)] for _ in range(batch)]
    X = jax.numpy.stack([lf.array(r) for r in rows])
    enc = jax.jit(lambda x: encode_rows(x, spec, n_cols))(X)
    assert enc.shape == (batch, n_cols, spec.num_limbs16)
    dec = jax.jit(lambda x: decode_rows(x, spec, n_per_row))(enc)
    for i in range(batch):
        assert limbs_to_ints(np.asarray(dec)[i]) == rows[i]


def test_rs_code_property():
    """Any n_per_row evaluations of the codeword determine the polynomial:
    check a Reed-Solomon identity — codeword at index i equals poly(w^i)."""
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(13)
    n_per_row, n_cols = 8, 32
    row = [rnd.randrange(spec.modulus) for _ in range(n_per_row)]
    enc = np.asarray(encode_rows(lf.array(row)[None], spec, n_cols))[0]
    w = spec.nth_root_of_unity(n_cols)
    for i in (0, 1, 5, 31):
        x = pow(w, i, spec.modulus)
        expect = 0
        for c in reversed(row):
            expect = (expect * x + c) % spec.modulus
        assert limbs_to_ints(enc[i : i + 1]) == [expect]
