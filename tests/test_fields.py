"""Field layer tests: limb arithmetic vs exact Python-int oracle, data
packing round trips (reference oracle family: proof-of-storage fields.rs
round-trip tests, SURVEY.md §4.3)."""

import random

import numpy as np
import jax
import pytest

from lcpc_proof_of_storage_tpu.fields.field import (
    FIELDS, FT63, FT127, FT255, FT253_192, WRITEABLE_FT63,
    bytes_to_field_values, field_values_to_bytes, ints_to_limbs, limbs_to_ints,
)
from lcpc_proof_of_storage_tpu.fields.limb import limb_field
from lcpc_proof_of_storage_tpu.crypto.chacha import ChaChaRng

SPECS = [FT63, FT127, FT255, FT253_192]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_limb_roundtrip(spec):
    rnd = random.Random(0)
    vals = [0, 1, spec.modulus - 1] + [rnd.randrange(spec.modulus) for _ in range(20)]
    arr = ints_to_limbs(vals, spec)
    assert limbs_to_ints(arr) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_limb_arithmetic_vs_oracle(spec):
    lf = limb_field(spec)
    rnd = random.Random(1)
    n = 64
    a = [rnd.randrange(spec.modulus) for _ in range(n)]
    b = [rnd.randrange(spec.modulus) for _ in range(n)]
    # adversarial values near the modulus
    a[:3] = [spec.modulus - 1, spec.modulus - 1, 0]
    b[:3] = [spec.modulus - 1, 1, 0]
    A, B = lf.array(a), lf.array(b)

    add = jax.jit(lf.add)(A, B)
    sub = jax.jit(lf.sub)(A, B)
    mul = jax.jit(lf.mul)(A, B)
    assert limbs_to_ints(np.asarray(add)) == [spec.add(x, y) for x, y in zip(a, b)]
    assert limbs_to_ints(np.asarray(sub)) == [spec.sub(x, y) for x, y in zip(a, b)]
    assert limbs_to_ints(np.asarray(mul)) == [spec.mul(x, y) for x, y in zip(a, b)]


@pytest.mark.parametrize("spec", [FT63, FT255], ids=lambda s: s.name)
def test_limb_dot_vs_oracle(spec):
    lf = limb_field(spec)
    rnd = random.Random(2)
    for n in (1, 5, 64, 1000):
        a = [rnd.randrange(spec.modulus) for _ in range(n)]
        b = [rnd.randrange(spec.modulus) for _ in range(n)]
        d = jax.jit(lambda x, y: lf.dot(x, y, axis=-2))(lf.array(a), lf.array(b))
        expect = sum(x * y for x, y in zip(a, b)) % spec.modulus
        assert limbs_to_ints(np.asarray(d)[None]) == [expect]


def test_limb_dot_chunked():
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(3)
    n = 40000  # > chunk limit, exercises two-stage reduction
    a = [rnd.randrange(spec.modulus) for _ in range(n)]
    b = [rnd.randrange(spec.modulus) for _ in range(n)]
    d = jax.jit(lambda x, y: lf.dot(x, y, axis=-2, chunk=4096))(lf.array(a), lf.array(b))
    expect = sum(x * y for x, y in zip(a, b)) % spec.modulus
    assert limbs_to_ints(np.asarray(d)[None]) == [expect]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_repr_bytes(spec):
    rnd = random.Random(4)
    for _ in range(10):
        v = rnd.randrange(spec.modulus)
        assert spec.from_repr(spec.to_repr(v)) == v
    assert len(spec.to_repr(0)) == spec.repr_bytes


@pytest.mark.parametrize("spec", [WRITEABLE_FT63, FT253_192], ids=lambda s: s.name)
def test_data_bytes_roundtrip(spec):
    # reference oracle: fields.rs:287-300 bytes->fields->bytes exactness
    rng = ChaChaRng.seed_from_u64(1337, rounds=8)
    for _ in range(50):
        data = rng.fill_bytes(spec.data_byte_capacity)
        v = spec.from_data_bytes(data)
        assert v < spec.modulus
        assert spec.to_data_bytes(v) == data

    blob = rng.fill_bytes(1000)
    vals = bytes_to_field_values(blob, spec)
    back = field_values_to_bytes(vals, spec)
    # zero-padded to a multiple of capacity (data_field.rs:50-56 semantics)
    assert back[: len(blob)] == blob
    assert all(x == 0 for x in back[len(blob):])


def test_writeable_ft63_constants():
    # data_field.rs:22: DATA_BYTE_CAPACITY = CAPACITY/8; WRITTEN = sizeof
    assert WRITEABLE_FT63.data_byte_capacity == 7
    assert WRITEABLE_FT63.repr_bytes == 8
    assert FT253_192.data_byte_capacity == 31
    assert FT253_192.repr_bytes == 32
    assert FT63.two_adicity >= 20  # room for large NTTs


def test_ff_random_semantics():
    # rejection sampling consumes u64 draws; deterministic per seed
    rng1 = ChaChaRng.seed_from_u64(7)
    rng2 = ChaChaRng.seed_from_u64(7)
    v1 = [FT255.random(rng1) for _ in range(20)]
    v2 = [FT255.random(rng2) for _ in range(20)]
    assert v1 == v2
    assert all(0 <= v < FT255.modulus for v in v1)
    assert len(set(v1)) == 20
