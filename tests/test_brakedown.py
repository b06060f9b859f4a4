"""Brakedown expander-code tests (reference: lcpc-brakedown-pc/src/tests.rs:
matgen+encode smoke, e2e one/two proofs, ML shape assertion, distinct seeds).
"""

import random

import jax
import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, prove, verify
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63, limbs_to_ints
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.expander import (
    ExpanderEncoder, SDIG_CODE_3, SDIG_CODES, generate, get_dims,
)


def test_get_dims_invariants():
    for code in SDIG_CODES:
        pre, post = get_dims(4096, 62.0, code)
        assert pre[0][0] == 4096
        for (ni, mi, cn), (nip, mip, dn) in zip(pre, post):
            assert mi < ni
            assert cn <= mi and cn > 0
            assert dn <= mip and dn > 0
        assert pre[-1][1] <= code.baselen


def test_matgen_deterministic_and_column_regular():
    spec = FT63
    pre1, post1 = generate(500, 0, spec, SDIG_CODE_3)
    pre2, _ = generate(500, 0, spec, SDIG_CODE_3)
    pre3, _ = generate(500, 1, spec, SDIG_CODE_3)
    assert pre1[0].col_indices == pre2[0].col_indices
    assert pre1[0].col_values == pre2[0].col_values
    assert pre1[0].col_indices != pre3[0].col_indices
    # column-regular: every column has exactly cn distinct sorted rows
    pre_dims, _ = get_dims(500, float(spec.num_bits - 1), SDIG_CODE_3)
    cn = pre_dims[0][2]
    for col in pre1[0].col_indices:
        assert len(col) == cn
        assert col == sorted(set(col))
    for vals in pre1[0].col_values:
        assert all(v != 0 for v in vals)


@pytest.mark.parametrize("force_numpy", [False, True],
                         ids=["native-or-numpy", "numpy-forced"])
def test_gen_code_vectorized_matches_seq(monkeypatch, force_numpy):
    """The fast gen_code paths must be bit-identical to the draw-by-draw
    oracle (indices, values, AND RNG consumption) — including duplicate-row
    fallback columns (small m forces collisions).  Parametrized so the
    numpy stream simulation is exercised even on hosts where the C++ walk
    builds (it would otherwise always win and ship untested)."""
    from lcpc_proof_of_storage_tpu.crypto.chacha import ChaChaRng
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.ops.expander import gen_code, gen_code_seq

    if force_numpy:
        monkeypatch.setenv("LCPC_NO_NATIVE_MATGEN", "1")
    cases = [(2000, 700, 8), (1500, 24, 6)]  # dense + collision-heavy
    for fname in ("ft63", "ft255"):
        f = FIELDS[fname]
        for n, m, d in cases:
            seed = bytes((i * 7 + 3) & 0xFF for i in range(32))
            r1, r2 = ChaChaRng(seed, 20), ChaChaRng(seed, 20)
            a = gen_code(n, m, d, r1, f)
            b = gen_code_seq(n, m, d, r2, f)
            assert a.idx_np is not None  # vectorized path actually taken
            assert a.col_indices == b.col_indices
            assert a.col_values == b.col_values
            assert (r1.next_u64_array(8) == r2.next_u64_array(8)).all()


def test_encode_linearity():
    spec = FT63
    lf = limb_field(spec)
    enc = ExpanderEncoder(64, 0, spec, SDIG_CODE_3)
    rnd = random.Random(0)
    a = [rnd.randrange(spec.modulus) for _ in range(64)]
    b = [rnd.randrange(spec.modulus) for _ in range(64)]
    A, B = lf.array(a)[None], lf.array(b)[None]
    f = jax.jit(enc.encode)
    lhs = limbs_to_ints(np.asarray(f(lf.add(A, B)))[0])
    ea = limbs_to_ints(np.asarray(f(A))[0])
    eb = limbs_to_ints(np.asarray(f(B))[0])
    rhs = [(x + y) % spec.modulus for x, y in zip(ea, eb)]
    assert lhs == rhs


def test_brakedown_end_to_end():
    spec = FT63
    rnd = random.Random(7)
    length = 2000
    coeffs = [rnd.randrange(spec.modulus) for _ in range(length)]
    enc = BrakedownEncoding.new(length, seed=0, field=spec)
    assert enc.n_per_row < enc.n_cols
    comm = commit(coeffs, enc)
    root = comm.get_root().root

    x = rnd.randrange(spec.modulus)
    inner = [pow(x, j, spec.modulus) for j in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]

    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    proof = prove(comm, outer, enc, tr)
    tv = Transcript(b"test transcript")
    tv.append_message(b"polycommit", root)
    res = verify(root, outer, inner, proof, enc, tv)

    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % spec.modulus
    assert res == expect
    assert tr.state_bytes() == tv.state_bytes()


def test_brakedown_ml_shape():
    # reference tests.rs:240-288: 2^lgl == n_rows * n_per_row for ML commits
    spec = FT63
    lgl = 11
    enc = BrakedownEncoding.new_ml(lgl, seed=1, field=spec)
    n_rows, n_per_row, _ = enc.get_dims(1 << lgl)
    assert n_per_row & (n_per_row - 1) == 0
    assert n_rows * n_per_row == 1 << lgl


@pytest.mark.parametrize(
    "mode", ["onepass", "onepass_chunked", "packed", "unpacked"])
def test_gather_matvec_fused_matches(monkeypatch, mode):
    """Fused pallas expander matvec == XLA path (interpret mode), in the
    one-pass layout (default; FT63 exercises the kg=4 small-L grouping and
    `_chunked` forces the output-row chunk loop incl. the clamped tail),
    the packed group layout, and the plain limb group layout."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setenv("LCPC_EXPANDER_PACKED",
                       "0" if mode == "unpacked" else "1")
    monkeypatch.setenv("LCPC_EXPANDER_ONEPASS",
                       "1" if mode.startswith("onepass") else "0")
    if mode == "onepass_chunked":
        # force mc = 2 tiles of 128 over a 5-tile m_pad: 3 chunks, the last
        # one start-clamped (recomputes an overlapping window)
        monkeypatch.setenv("LCPC_EXPANDER_CHUNK_BYTES", "3e5")
    import lcpc_proof_of_storage_tpu.ops.expander_pallas as ep
    monkeypatch.setattr(ep, "_TM_OP",
                        128 if mode == "onepass_chunked" else ep._TM_OP)
    ep._group_call.cache_clear()
    ep._group_call_packed.cache_clear()
    ep._onepass_call.cache_clear()
    from lcpc_proof_of_storage_tpu.ops.expander import gather_matvec, generate, to_gather
    spec = FT63
    lf = limb_field(spec)
    n_in = 3000 if mode == "onepass_chunked" else 300
    pre, post = generate(n_in, 0, spec, SDIG_CODE_3)
    gm = to_gather(pre[0], spec)
    rnd = random.Random(0)
    x = [[rnd.randrange(spec.modulus) for _ in range(gm.cols)] for _ in range(2)]
    X = jax.numpy.stack([lf.array(v) for v in x])
    ref = np.asarray(gather_matvec(gm, X, spec))     # XLA (cpu backend)
    got = np.asarray(ep.gather_matvec_fused(gm, X, spec))
    ep._group_call.cache_clear()
    ep._group_call_packed.cache_clear()
    ep._onepass_call.cache_clear()
    assert np.array_equal(got, ref)
