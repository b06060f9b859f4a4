"""Read-path family tests: the reference's 4-paths-agree oracle
(proof-of-storage/src/fields.rs:302-357) plus write/read round-trips and
the byte/element iterators."""

import asyncio
import os

import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.fields.field import (FT253_192, FT255,
                                                    WRITEABLE_FT63)
from lcpc_proof_of_storage_tpu.pos.readers import (
    FieldGeneratorIter, RandomBytesIterator, field_elements_to_file,
    read_file_path_to_field_elements, read_file_to_field_elements,
    random_writeable_field_vec, stream_file_to_field_elements_async,
    stream_file_to_field_elements_sync)
from lcpc_proof_of_storage_tpu.pos.storage import data_bytes_to_limbs_np

SPECS = [WRITEABLE_FT63, FT255, FT253_192]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("size", [0, 1, 37, 4096, 12_345])
def test_four_read_paths_agree(tmp_path, spec, size):
    """fields.rs:302-357 — whole-read, sync stream, async stream, and
    path-read must produce identical element vectors (incl. a non-multiple
    tail and small buf_mult to force multi-chunk streaming)."""
    data = RandomBytesIterator(seed=size + 1).take_bytes(size)
    p = tmp_path / "f.bin"
    p.write_bytes(data)

    with open(p, "rb") as f:
        n1, a = read_file_to_field_elements(f, spec)
    with open(p, "rb") as f:
        n2, b = stream_file_to_field_elements_sync(f, spec, buf_mult=7)
    n3, c = asyncio.run(
        stream_file_to_field_elements_async(p, spec, buf_mult=5))
    d = read_file_path_to_field_elements(p, spec)

    assert n1 == n2 == n3 == size
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)
    assert np.array_equal(a, d)
    # element count = ceil(size / capacity)
    cap = spec.data_byte_capacity
    assert len(a) == (size + cap - 1) // cap


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_write_read_round_trip(tmp_path, spec):
    """fields.rs:128-146 — field_elements_to_file drops the final element's
    trailing zero bytes, so write(read(data)) == data when data doesn't end
    in 0x00."""
    data = RandomBytesIterator(seed=9).take_bytes(1000) + b"\x07"
    limbs = data_bytes_to_limbs_np(data, spec)
    p = tmp_path / "w.bin"
    field_elements_to_file(p, limbs, spec)
    assert p.read_bytes() == data
    back = read_file_path_to_field_elements(p, spec)
    assert np.array_equal(back, limbs)


def test_field_generator_iter_matches_batch():
    """field_generator_iter.rs — iterating bytes chunk-by-chunk equals the
    batch converter, including the zero-padded partial tail."""
    spec = WRITEABLE_FT63
    data = RandomBytesIterator(seed=3).take_bytes(5 * spec.data_byte_capacity + 3)
    want = data_bytes_to_limbs_np(data, spec)
    got = np.stack(list(FieldGeneratorIter(iter(data), spec)))
    assert np.array_equal(got, want)


def test_random_bytes_iterator_protocol():
    rbi = RandomBytesIterator(seed=1)
    first = [next(rbi) for _ in range(10)]
    assert all(0 <= b < 256 for b in first)
    rbi2 = RandomBytesIterator(seed=1)
    assert rbi2.take_bytes(10) == bytes(first)  # deterministic per seed


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_random_writeable_field_vec_in_range(spec):
    """fields.rs:148-160 — 2^log_len elements, all canonical (< modulus)."""
    limbs = random_writeable_field_vec(5, spec, seed=2)
    assert limbs.shape == (32, spec.num_limbs16)
    for row in limbs:
        v = sum(int(x) << (16 * i) for i, x in enumerate(row))
        assert v < spec.modulus
