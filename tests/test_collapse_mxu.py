"""Bit-identity of the int8 MXU collapse (ops/collapse_mxu.py) against the
python-int oracle, incl. the >1024-row chunked path and uint16 inputs.
Hardware counterpart: scripts/r5_campaign.py collapse_mxu (validated
bit-equal on the real chip, 2026-08-20)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255, limbs_to_ints
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.collapse_mxu import collapse_tensors_mxu


@pytest.mark.parametrize("spec,rows,npr", [
    (FT255, 13, 37),
    (FT255, 1030, 17),       # one chunk boundary crossed
    (FT63, 100, 50),
])
def test_mxu_collapse_matches_oracle(spec, rows, npr):
    rnd = random.Random(rows)
    lf = limb_field(spec)
    cm_i = [[rnd.randrange(spec.modulus) for _ in range(npr)]
            for _ in range(rows)]
    t_i = [[rnd.randrange(spec.modulus) for _ in range(rows)]
           for _ in range(2)]
    cm = jnp.stack([lf.array(r) for r in cm_i]).astype(jnp.uint16)
    tm = jnp.stack([lf.array(r) for r in t_i])
    got = np.asarray(jax.jit(
        lambda c, t: collapse_tensors_mxu(c, t, spec))(cm, tm))
    for t in range(2):
        want = [sum(t_i[t][r] * cm_i[r][j] for r in range(rows))
                % spec.modulus for j in range(npr)]
        assert limbs_to_ints(got[t]) == want, (spec.name, rows, npr, t)


def test_mxu_collapse_prove_verify_roundtrip(monkeypatch):
    """The full protocol with LCPC_COLLAPSE_KERNEL=mxu: same proof bytes
    as the default kernel (collapse output is bit-identical, so the
    Fiat-Shamir evolution is too)."""
    monkeypatch.setenv("LCPC_COLLAPSE_KERNEL", "mxu")
    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.core.commit import commit, prove, verify
    from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
    spec = FT63
    p = spec.modulus
    rnd = random.Random(31)
    coeffs = [rnd.randrange(p) for _ in range(16 * 9 - 2)]
    enc = LigeroEncoding.new_from_dims(16, 64, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root
    x = rnd.randrange(p)
    inner = [pow(x, j, p) for j in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, p)
    outer = [pow(xr, i, p) for i in range(comm.n_rows)]
    tr = Transcript(b"mxu")
    tr.append_message(b"polycommit", root)
    proof = prove(comm, outer, enc, tr)
    monkeypatch.delenv("LCPC_COLLAPSE_KERNEL")
    tr2 = Transcript(b"mxu")
    tr2.append_message(b"polycommit", root)
    proof_default = prove(comm, outer, enc, tr2)
    assert proof.p_eval == proof_default.p_eval
    assert proof.p_random_vec == proof_default.p_random_vec
    tv = Transcript(b"mxu")
    tv.append_message(b"polycommit", root)
    res = verify(root, outer, inner, proof, enc, tv)
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * x + c) % p
    assert res == expect
