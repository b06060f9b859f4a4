"""Native host NTT (posnative.cc pos_ntt_rows_u64) oracle tests.

The one-u64-field streaming path (reference: proof-of-storage/src/
lcpc_online/encoded_file_writer.rs encode loop) must be bit-identical to
the XLA limb NTT, which is itself pinned to python-int DFT oracles."""

import numpy as np
import pytest

from lcpc_proof_of_storage_tpu import native as nat
from lcpc_proof_of_storage_tpu.fields.field import FT63
from lcpc_proof_of_storage_tpu.ops.ntt import encode_rows, intt
from lcpc_proof_of_storage_tpu.pos.storage import (
    limbs_to_u64_np,
    u64_to_limbs_np,
)

pytestmark = pytest.mark.skipif(nat.native() is None,
                                reason="native library unavailable")


@pytest.mark.parametrize("k,n_in,n", [
    (3, 96, 512),      # pruned stages (np2(96)=128, skip=2)
    (2, 100, 256),     # odd stage parity after pruning
    (1, 1, 2),         # smallest transform
    (2, 3, 8),
    (4, 256, 1024),    # exact power-of-two input
])
def test_native_ntt_matches_xla(k, n_in, n):
    rng = np.random.default_rng(n * 31 + k)
    vals = np.ascontiguousarray(
        rng.integers(0, FT63.modulus, (k, n_in), dtype=np.uint64))
    out = np.empty((k, n), np.uint64)
    assert nat.ntt_rows_u64(vals, out, n, FT63.modulus,
                            FT63.nth_root_of_unity(n))
    want = np.asarray(encode_rows(u64_to_limbs_np(vals), FT63, n))
    assert np.array_equal(u64_to_limbs_np(out), want)


def test_native_intt_roundtrip_matches_xla():
    rng = np.random.default_rng(7)
    k, n = 3, 512
    vals = np.ascontiguousarray(
        rng.integers(0, FT63.modulus, (k, n), dtype=np.uint64))
    out = np.empty((k, n), np.uint64)
    assert nat.intt_rows_u64(vals, out, n, FT63.modulus,
                             FT63.inv(FT63.nth_root_of_unity(n)),
                             FT63.inv(n % FT63.modulus))
    want = np.asarray(intt(u64_to_limbs_np(vals).astype(np.uint32), FT63))
    assert np.array_equal(u64_to_limbs_np(out), want)
    back = np.empty((k, n), np.uint64)
    assert nat.ntt_rows_u64(out, back, n, FT63.modulus,
                            FT63.nth_root_of_unity(n))
    assert np.array_equal(back, vals)


def test_limb_u64_round_trip():
    rng = np.random.default_rng(3)
    v = rng.integers(0, FT63.modulus, (5, 7), dtype=np.uint64)
    assert np.array_equal(limbs_to_u64_np(u64_to_limbs_np(v)), v)
