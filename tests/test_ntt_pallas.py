"""Pallas kernel oracle tests (interpret mode on CPU).

The fused butterfly kernels must be bit-identical to the XLA limb pipeline
(which is itself tested against Python-int DFT oracles).  ft63 only here:
interpret mode is slow and the kernel code is generic over L; the real-TPU
run covers ft255 (driven during bench).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from lcpc_proof_of_storage_tpu.fields.field import FT63, limbs_to_ints
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.ops.ntt import intt, ntt


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    # drop cached pallas_call closures built without interpret
    import lcpc_proof_of_storage_tpu.ops.ntt_pallas as ntp
    ntp._stage_call.cache_clear()
    ntp._scale_call.cache_clear()
    yield
    ntp._stage_call.cache_clear()
    ntp._scale_call.cache_clear()


def test_ntt_pallas_matches_xla(interpret_pallas):
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas import ntt_pallas
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(0)
    n, b = 256, 2
    vals = [[rnd.randrange(spec.modulus) for _ in range(n)] for _ in range(b)]
    X = jnp.stack([lf.array(v) for v in vals])
    ref = np.asarray(ntt(X, spec))
    got = np.asarray(ntt_pallas(X, spec))
    assert np.array_equal(got, ref)
    # inverse round trip
    back = np.asarray(ntt_pallas(jnp.asarray(got), spec, inverse=True))
    iref = np.asarray(intt(jnp.asarray(got), spec))
    assert np.array_equal(back, iref)


def test_mul_mod_pallas_matches_oracle(interpret_pallas):
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas import mul_mod_pallas
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(1)
    N = 512
    a = [rnd.randrange(spec.modulus) for _ in range(N)]
    b = [rnd.randrange(spec.modulus) for _ in range(N)]
    got = limbs_to_ints(np.asarray(mul_mod_pallas(lf.array(a), lf.array(b), spec)))
    assert got == [(x * y) % spec.modulus for x, y in zip(a, b)]


def test_ntt_pallas_pruned_matches_xla(interpret_pallas):
    """Zero-padding-aware stage pruning must be exact."""
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas import ntt_pallas
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(3)
    n, npr, b = 256, 64, 2      # rho = 1/4: prunes 2 stages
    vals = [[rnd.randrange(spec.modulus) for _ in range(npr)] for _ in range(b)]
    X = jnp.zeros((b, n, spec.num_limbs16), jnp.uint32)
    for i, v in enumerate(vals):
        X = X.at[i, :npr, :].set(lf.array(v))
    ref = np.asarray(ntt(X, spec))
    got = np.asarray(ntt_pallas(X, spec, n_nonzero=npr))
    assert np.array_equal(got, ref)
    # non-power-of-two nonzero count also prunes correctly
    got2 = np.asarray(ntt_pallas(X, spec, n_nonzero=60))
    assert np.array_equal(got2, ref)
