"""v2 Pallas NTT kernel oracle tests (interpret mode on CPU).

The constant-multiply pair-grouped kernels (ops/ntt_pallas2.py) must be
bit-identical to the XLA limb pipeline.  ft63 here (interpret mode is slow;
the kernel code is generic over L); real-TPU ft255 runs are covered by
scripts/tpu_validate_bench.py."""

import random

import numpy as np
import pytest
from jax.experimental import pallas as pl

from lcpc_proof_of_storage_tpu.fields.field import FT63
from lcpc_proof_of_storage_tpu.ops.ntt import ntt


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import lcpc_proof_of_storage_tpu.ops.ntt_pallas2 as n2
    n2._in_tile_call.cache_clear()
    n2._large_pair_call.cache_clear()
    yield
    n2._in_tile_call.cache_clear()
    n2._large_pair_call.cache_clear()


@pytest.mark.parametrize("n,batch", [(256, 2), (2048, 1), (4096, 1)])
def test_ntt_pallas2_matches_xla(interpret_pallas, n, batch):
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import ntt_pallas2
    rnd = random.Random(n)
    L = FT63.num_limbs16
    vals = np.array(
        [[rnd.randrange(FT63.modulus) for _ in range(n)] for _ in range(batch)],
        dtype=object)
    x = np.zeros((batch, n, L), np.uint32)
    for i in range(L):
        x[..., i] = ((vals >> (16 * i)) & 0xFFFF).astype(np.uint32)
    got = np.asarray(ntt_pallas2(x, FT63))
    want = np.asarray(ntt(x, FT63))
    assert np.array_equal(got, want)


def test_ntt_pallas2_inverse_matches_xla(interpret_pallas):
    from lcpc_proof_of_storage_tpu.ops.ntt import intt
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import ntt_pallas2
    rnd = random.Random(77)
    n, L = 1024, FT63.num_limbs16
    x = np.zeros((2, n, L), np.uint32)
    for b in range(2):
        for j in range(n):
            v = rnd.randrange(FT63.modulus)
            for i in range(L):
                x[b, j, i] = (v >> (16 * i)) & 0xFFFF
    got = np.asarray(ntt_pallas2(x, FT63, inverse=True))
    want = np.asarray(intt(x, FT63))
    assert np.array_equal(got, want)
    # round trip: intt(ntt(x)) == x
    rt = np.asarray(ntt_pallas2(np.asarray(ntt_pallas2(x, FT63)), FT63,
                                inverse=True))
    assert np.array_equal(rt, x)


@pytest.mark.parametrize("n,nonzero", [(1024, 256), (2048, 100)])
def test_ntt_pallas2_stage_pruning(interpret_pallas, n, nonzero):
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import ntt_pallas2
    rnd = random.Random(nonzero)
    L = FT63.num_limbs16
    x = np.zeros((1, n, L), np.uint32)
    for j in range(nonzero):
        v = rnd.randrange(FT63.modulus)
        for i in range(L):
            x[0, j, i] = (v >> (16 * i)) & 0xFFFF
    got = np.asarray(ntt_pallas2(x, FT63, n_nonzero=nonzero))
    want = np.asarray(ntt(x, FT63))
    assert np.array_equal(got, want)
