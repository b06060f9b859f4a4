"""v3 two-kernel four-step NTT == ops/ntt.py oracle (bit-exact).

Interpret mode on CPU, ft63 only (interpret is slow; the kernels are
generic over L) — real-TPU ft255 runs are covered by
scripts/tpu_validate_bench.py."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from lcpc_proof_of_storage_tpu.fields.field import FT63
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.ntt import ntt
from lcpc_proof_of_storage_tpu.ops.ntt_pallas3 import (
    _split3, ntt_pallas3, v3_applicable, v3_device_tables)


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import lcpc_proof_of_storage_tpu.ops.ntt_pallas3 as n3
    n3._call_a.cache_clear()
    n3._call_b.cache_clear()
    yield
    n3._call_a.cache_clear()
    n3._call_b.cache_clear()


def _rand_mat(spec, b, n, seed, n_nonzero=None):
    rnd = random.Random(seed)
    lf = limb_field(spec)
    nz = n_nonzero if n_nonzero is not None else n
    vals = [[rnd.randrange(spec.modulus) if j < nz else 0 for j in range(n)]
            for _ in range(b)]
    return jnp.stack([lf.array(v) for v in vals])


def test_v3_matches_oracle(interpret_pallas):
    spec = FT63
    n, b = 1 << 15, 2
    assert v3_applicable(n)
    x = _rand_mat(spec, b, n, 1)
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    got = np.asarray(ntt_pallas3(x, spec))
    assert np.array_equal(got, ref)


def test_v3_pruned_matches_oracle(interpret_pallas):
    spec = FT63
    n, b = 1 << 15, 1
    for nnz in (n // 4, 3000):
        x = _rand_mat(spec, b, n, nnz)
        x = x.at[:, nnz:, :].set(0)
        ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
        got = np.asarray(ntt_pallas3(x, spec, n_nonzero=nnz))
        assert np.array_equal(got, ref), nnz


def test_v3_device_tables_threading(interpret_pallas):
    spec = FT63
    n, b = 1 << 15, 1
    nnz = n // 4
    x = _rand_mat(spec, b, n, 5, n_nonzero=nnz)
    tabs = v3_device_tables(spec, n, n_nonzero=nnz)
    f = jax.jit(lambda a, tt: ntt_pallas3(a, spec, n_nonzero=nnz, tables=tt))
    got = np.asarray(f(x, tabs))
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    assert np.array_equal(got, ref)


def test_v3_loop_bitrev_matches_oracle(interpret_pallas, monkeypatch):
    """Two-factor split bitrev (nz > _NZ_UNROLL, the 2^27+ unlock) is
    bit-identical to the static-unroll form and the oracle."""
    import lcpc_proof_of_storage_tpu.ops.ntt_pallas3 as n3
    spec = FT63
    n, b = 1 << 15, 1
    nnz = n // 4                         # nz_rows = 32 at this shape
    x = _rand_mat(spec, b, n, 11, n_nonzero=nnz)
    ref = np.asarray(ntt_pallas3(x, spec, n_nonzero=nnz))
    monkeypatch.setattr(n3, "_NZ_UNROLL", 8)   # force the loop variant
    n3._call_a.cache_clear()
    got = np.asarray(ntt_pallas3(x, spec, n_nonzero=nnz))
    n3._call_a.cache_clear()
    assert np.array_equal(got, ref)
    assert np.array_equal(
        ref, np.asarray(jax.jit(lambda a: ntt(a, spec))(x)))


def test_v3_split_bounds():
    assert _split3(1 << 14) is None
    for lg in range(15, 19):
        n1, n2 = _split3(1 << lg)
        assert n1 * n2 == 1 << lg and n1 >= 128 and n2 >= 2
    # extended window: n1 = 2048 for the 2^27-2^29 commit column counts
    assert _split3(1 << 19) == (2048, 256)
    assert _split3(1 << 20) == (2048, 512)
    assert _split3(1 << 21) is None
    assert not v3_applicable(3 * (1 << 14))


def test_v3_extended_window_matches_oracle(interpret_pallas, monkeypatch):
    """Exercise the XL-window split branch (same kernels, scaled-down
    factor bounds so interpret mode stays fast); hardware runs the real
    n=2^19 shape via scripts/r4_campaign.py."""
    import lcpc_proof_of_storage_tpu.ops.ntt_pallas3 as n3
    monkeypatch.setattr(n3, "_NMIN", 1 << 12)
    monkeypatch.setattr(n3, "_N1MAX", 128)
    monkeypatch.setattr(n3, "_N2MAX", 16)
    monkeypatch.setattr(n3, "_N1MAX_XL", 256)
    monkeypatch.setattr(n3, "_N2MAX_XL", 32)
    n3._v3_tables_np.cache_clear()
    spec = FT63
    n, b = 1 << 12, 1                      # > _N1MAX*_N2MAX -> XL branch
    assert n3._split3(n) == (256, 16)
    nnz = n // 4
    x = _rand_mat(spec, b, n, 7, n_nonzero=nnz)
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    got = np.asarray(n3.ntt_pallas3(x, spec, n_nonzero=nnz))
    n3._v3_tables_np.cache_clear()
    assert np.array_equal(got, ref)
