"""Four-step NTT (ops/ntt_pallas2.ntt_four_step) vs the XLA oracle.

The factorization must be bit-identical to ops.ntt.ntt for every (n, skip)
shape class: both sub-NTT lengths in/out of the packed-stage regime, zero-
pad pruning crossing the group boundary, and the operand-bundle path the
commit pipeline uses (tables threaded through jit as arguments).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.ntt import ntt
from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import (
    _fs_split, fs_device_tables, ntt_four_step,
)


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import lcpc_proof_of_storage_tpu.ops.ntt_pallas2 as n2
    n2._in_tile_call.cache_clear()
    n2._in_tile_call_mul.cache_clear()
    yield
    n2._in_tile_call.cache_clear()
    n2._in_tile_call_mul.cache_clear()


def _rand_x(spec, batch, n, nnz=None, seed=0):
    lf = limb_field(spec)
    rnd = random.Random(seed)
    rows = []
    for _ in range(batch):
        vals = [rnd.randrange(spec.modulus) for _ in range(nnz or n)]
        vals += [0] * (n - len(vals))
        rows.append(lf.array(vals))
    return jnp.stack(rows)


@pytest.mark.parametrize("n", [2048, 4096, 8192])
def test_fourstep_matches_oracle(n):
    spec = FT63
    x = _rand_x(spec, 3, n, seed=n)
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    got = np.asarray(ntt_four_step(x, spec))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("nnz_div", [4, 2])
def test_fourstep_pruned(nnz_div):
    spec = FT63
    n = 4096
    nnz = n // nnz_div
    x = _rand_x(spec, 2, n, nnz=nnz, seed=nnz)
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    got = np.asarray(ntt_four_step(x, spec, n_nonzero=nnz))
    assert np.array_equal(got, ref)


def test_fourstep_pruned_past_pass_a():
    """n_nonzero <= n1 makes skip == log2(n2): pass A has no stages (the
    duplicated-input groups ARE its output) — must not crash."""
    spec = FT63
    n = 4096
    n1, _n2 = _fs_split(n)
    nnz = n1 // 2
    x = _rand_x(spec, 2, n, nnz=nnz, seed=5)
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    got = np.asarray(ntt_four_step(x, spec, n_nonzero=nnz))
    assert np.array_equal(got, ref)


def test_fourstep_ft255_with_device_tables():
    """The commit-pipeline shape: ft255, rho=1/4 pruning, tables as jit
    arguments (fs_device_tables 8-tuple through ntt_pallas2 dispatch)."""
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import ntt_pallas2
    spec = FT255
    n = 2048
    nnz = n // 4
    x = _rand_x(spec, 2, n, nnz=nnz, seed=7)
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    tabs = fs_device_tables(spec, n, n_nonzero=nnz)
    got = np.asarray(jax.jit(
        lambda a, tb: ntt_pallas2(a, spec, n_nonzero=nnz, tables=tb)
    )(x, tabs))
    assert np.array_equal(got, ref)


def test_fs_split_bounds():
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import _TILE2
    assert _fs_split(_TILE2) is None            # in-tile already
    n1, n2 = _fs_split(4 * _TILE2)
    assert n1 * n2 == 4 * _TILE2 and max(n1, n2) <= _TILE2
    assert _fs_split(_TILE2 * _TILE2 * 2) is None
