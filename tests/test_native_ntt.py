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


# -- four-word (ft253_192-class) native NTT ---------------------------------

def _dft_ints(vals, n, p, w):
    out = []
    for j in range(n):
        wj = pow(w, j, p)
        acc, cur = 0, 1
        for v in vals:
            acc = (acc + v * cur) % p
            cur = (cur * wj) % p
        out.append(acc)
    return out


@pytest.mark.parametrize("fname,k,n_in,n", [
    ("ft253_192", 3, 17, 64),     # pruned stages + partial row
    ("ft253_192", 2, 64, 256),
    ("ft255", 2, 50, 128),        # second 4-word field, odd input length
])
def test_native_ntt_w4_matches_dft(fname, k, n_in, n):
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS, ints_to_limbs
    from lcpc_proof_of_storage_tpu.pos.storage import (limbs_to_w4_np,
                                                       w4_to_limbs_np)
    spec = FIELDS[fname]
    rng = np.random.default_rng(n * 13 + k)
    vals = [[int(x) % spec.modulus for x in
             rng.integers(0, 1 << 62, n_in)] for _ in range(k)]
    limbs = np.stack([ints_to_limbs(v, spec) for v in vals])
    w4 = np.ascontiguousarray(limbs_to_w4_np(limbs))
    out = np.empty((k, n, 4), np.uint64)
    w = spec.nth_root_of_unity(n)
    assert nat.ntt_rows_w4(w4, out, n, spec.modulus, w)
    ref = np.stack([ints_to_limbs(_dft_ints(v, n, spec.modulus, w), spec)
                    for v in vals])
    assert np.array_equal(w4_to_limbs_np(out), ref)


def test_w4_writer_root_matches_device_path(tmp_path):
    """EncodedFileWriter through the native w4 NTT produces the same
    encoded file + Merkle root as the XLA device path (ft253_192)."""
    import os

    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.pos.storage import (EncodedFileWriter,
                                                       _encode_batch)
    spec = FIELDS["ft253_192"]
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=40_000, dtype=np.uint8).tobytes()
    roots, files = [], []
    for mode in ("auto", "device"):
        os.environ["LCPC_HOST_ENCODE"] = mode
        _encode_batch.cache_clear()
        try:
            p = tmp_path / f"w4_{mode}.porenc"
            w = EncodedFileWriter(16, 64, len(data), p, spec)
            w.push_bytes(data)
            meta, tree = w.finalize_to_merkle_tree()
            roots.append(tree.root())
            files.append(p.read_bytes())
        finally:
            os.environ.pop("LCPC_HOST_ENCODE", None)
            _encode_batch.cache_clear()
    assert roots[0] == roots[1]
    assert files[0] == files[1]


def test_native_intt_w4_roundtrip():
    """w4 forward -> native inverse recovers the input (ft253_192)."""
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS, ints_to_limbs
    from lcpc_proof_of_storage_tpu.pos.storage import (limbs_to_w4_np,
                                                       w4_to_limbs_np)
    spec = FIELDS["ft253_192"]
    rng = np.random.default_rng(3)
    k, n = 2, 128
    vals = [[int(x) % spec.modulus for x in rng.integers(0, 1 << 62, n)]
            for _ in range(k)]
    limbs = np.stack([ints_to_limbs(v, spec) for v in vals])
    w4 = np.ascontiguousarray(limbs_to_w4_np(limbs))
    fwd = np.empty((k, n, 4), np.uint64)
    w = spec.nth_root_of_unity(n)
    assert nat.ntt_rows_w4(w4, fwd, n, spec.modulus, w)
    back = np.empty_like(fwd)
    assert nat.intt_rows_w4(fwd, back, n, spec.modulus, w)
    assert np.array_equal(w4_to_limbs_np(back), limbs)


def test_w4_reader_decode_roundtrip(tmp_path):
    """Write (native w4 encode) then decode_to_bytes (native w4 inverse)
    recovers the original bytes for ft253_192."""
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.pos.storage import (EncodedFileReader,
                                                       EncodedFileWriter)
    spec = FIELDS["ft253_192"]
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=9_000, dtype=np.uint8).tobytes()
    p = tmp_path / "w4dec.porenc"
    w = EncodedFileWriter(16, 64, len(data), p, spec)
    w.push_bytes(data)
    meta, _ = w.finalize_to_merkle_tree()
    r = EncodedFileReader(p, spec, 16, 64, meta.rows_written,
                          meta.row_capacity)
    out = r.decode_to_bytes()
    r.close()
    assert out[: len(data)] == data
