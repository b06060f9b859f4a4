"""One-pass collapse kernel vs the XLA limb-dot oracle (interpret mode).

ft63 at small shapes (interpret mode is slow); the real-TPU run covers
ft255 at protocol shapes (scripts/tpu_validate_bench.py + r4 campaign).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from lcpc_proof_of_storage_tpu.fields.field import FT63
from lcpc_proof_of_storage_tpu.fields.limb import limb_field


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import lcpc_proof_of_storage_tpu.ops.collapse_pallas as cp
    cp._collapse_call.cache_clear()
    cp._natural_call.cache_clear()
    yield
    cp._collapse_call.cache_clear()
    cp._natural_call.cache_clear()


def _oracle(coeffs, t_limbs, spec):
    lf = limb_field(spec)
    # the production XLA path: exact widened products + chunked lazy sum
    return np.stack([
        np.asarray(lf.dot(jnp.asarray(coeffs).astype(jnp.uint32),
                          jnp.asarray(t_limbs[i])[:, None, :], axis=0))
        for i in range(t_limbs.shape[0])])


@pytest.mark.parametrize("rows,npr,T", [(5, 96, 1), (16, 200, 2), (3, 130, 3)])
def test_collapse_kernel_matches_oracle(interpret_pallas, rows, npr, T):
    from lcpc_proof_of_storage_tpu.ops.collapse_pallas import collapse_tensors
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(rows * 1000 + npr + T)
    coeffs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(npr)])) for _ in range(rows)])
    t_limbs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(rows)])) for _ in range(T)])
    got = np.asarray(collapse_tensors(jnp.asarray(coeffs),
                                      jnp.asarray(t_limbs), spec))
    ref = _oracle(coeffs, t_limbs, spec)
    assert np.array_equal(got, ref)


def test_prove_via_collapse_kernel_bit_identical(interpret_pallas,
                                                 monkeypatch):
    """prove() routed through the kernel produces byte-identical proofs."""
    import lcpc_proof_of_storage_tpu.core.commit as C
    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
    from lcpc_proof_of_storage_tpu.utils.serde import serialize_proof

    spec = FT63
    lf = limb_field(spec)
    n = 1 << 10
    enc = LigeroEncoding.new(n, spec, rho=(1, 4))
    rnd = random.Random(3)
    coeffs = [rnd.randrange(spec.modulus) for _ in range(n)]
    comm = C.commit(coeffs, enc)
    root = comm.get_root().root
    outer = [pow(9, i, spec.modulus) for i in range(comm.n_rows)]

    def tr():
        t = Transcript(b"collapse kernel test")
        t.append_message(b"polycommit", root)
        t.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return t

    baseline = serialize_proof(C.prove(comm, outer, enc, tr()), spec)
    monkeypatch.setattr(C, "_use_collapse_kernel", lambda s: True)
    C._collapse_kernel_fn_mode.cache_clear()
    try:
        via_kernel = serialize_proof(C.prove(comm, outer, enc, tr()), spec)
        # and again through the packed (non-natural) kernel path
        monkeypatch.setenv("LCPC_COLLAPSE_NATURAL", "0")
        via_packed = serialize_proof(C.prove(comm, outer, enc, tr()), spec)
    finally:
        C._collapse_kernel_fn_mode.cache_clear()
    assert via_kernel == baseline
    assert via_packed == baseline


def test_collapse_kernel_uint16_and_chunking(interpret_pallas, monkeypatch):
    """uint16 coefficient input (streamed commits) + the >_MAX_ROWS split."""
    import lcpc_proof_of_storage_tpu.ops.collapse_pallas as cp
    monkeypatch.setattr(cp, "_MAX_ROWS", 4)      # force the chunked path
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(7)
    rows, npr, T = 11, 140, 2
    coeffs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(npr)])) for _ in range(rows)])
    t_limbs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(rows)])) for _ in range(T)])
    got = np.asarray(cp.collapse_tensors(
        jnp.asarray(coeffs.astype(np.uint16)), jnp.asarray(t_limbs), spec))
    ref = _oracle(coeffs, t_limbs, spec)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("rows,npr,T", [(5, 96, 1), (16, 200, 2), (3, 130, 3),
                                        (142, 129, 2)])
def test_natural_kernel_matches_oracle(interpret_pallas, rows, npr, T):
    """Natural-layout kernel (round 5): bit-identical to the XLA oracle,
    including OOB row-group padding (rows not a multiple of 8)."""
    from lcpc_proof_of_storage_tpu.ops.collapse_pallas import (
        collapse_tensors_natural)
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(rows * 991 + npr + T)
    coeffs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(npr)])) for _ in range(rows)])
    t_limbs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(rows)])) for _ in range(T)])
    got = np.asarray(collapse_tensors_natural(
        jnp.asarray(coeffs), jnp.asarray(t_limbs), spec))
    ref = _oracle(coeffs, t_limbs, spec)
    assert np.array_equal(got, ref)


def test_natural_kernel_uint16_and_chunking(interpret_pallas, monkeypatch):
    """uint16 input + chunk partial summation (>_MAX_ROWS rows)."""
    import lcpc_proof_of_storage_tpu.ops.collapse_pallas as cp
    monkeypatch.setattr(cp, "_MAX_ROWS", 16)     # force the chunked path
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(77)
    rows, npr, T = 43, 140, 2                     # 3 chunks, ragged tail
    coeffs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(npr)])) for _ in range(rows)])
    t_limbs = np.stack([
        np.asarray(lf.array([rnd.randrange(spec.modulus)
                             for _ in range(rows)])) for _ in range(T)])
    got = np.asarray(cp.collapse_tensors_natural(
        jnp.asarray(coeffs.astype(np.uint16)), jnp.asarray(t_limbs), spec))
    ref = _oracle(coeffs, t_limbs, spec)
    assert np.array_equal(got, ref)
