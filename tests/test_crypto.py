"""Host crypto primitive tests: Keccak/STROBE/merlin, ChaCha, Blake3.

These primitives define the bit-level protocol contract (Fiat-Shamir
challenges and commitment digests) of the reference (lcpc-2d/src/lib.rs,
networking/client.rs), so they get spec test vectors where published vectors
exist, plus structural self-checks.
"""

import numpy as np
import pytest

from lcpc_proof_of_storage_tpu.crypto.keccak import sha3_256
from lcpc_proof_of_storage_tpu.crypto.blake3_ref import blake3, Blake3Hasher
from lcpc_proof_of_storage_tpu.crypto.chacha import (
    ChaChaRng, UniformUsize, choose_multiple, gen_range_u64, seed_from_u64,
)
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript


def test_keccak_sha3_vector():
    assert sha3_256(b"").hex() == (
        "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a"
    )
    assert sha3_256(b"abc").hex() == (
        "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532"
    )


def test_blake3_vectors():
    # Official BLAKE3 test vectors (b3 repo test_vectors.json), inputs are the
    # repeating byte pattern i % 251.
    assert blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert blake3(bytes([0])).hex() == (
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"
    )
    data1025 = bytes(i % 251 for i in range(1025))
    assert blake3(data1025).hex().startswith("d00278ae")


def test_blake3_structure():
    # chunk boundary behavior: adding one byte changes everything
    a = blake3(b"\x00" * 1024)
    b = blake3(b"\x00" * 1025)
    assert a != b
    # incremental == one-shot
    h = Blake3Hasher()
    h.update(b"\x00" * 32)
    h.update(bytes(range(100)))
    assert h.finalize() == blake3(b"\x00" * 32 + bytes(range(100)))
    # multi-level tree (5 chunks exercises uneven split)
    assert len(blake3(bytes(5000))) == 32


def test_chacha20_zero_key_keystream():
    # djb's ChaCha20 reference keystream: zero key, zero nonce, counter 0.
    r = ChaChaRng(bytes(32), 20)
    assert r.fill_bytes(16).hex() == "76b8e0ada0f13d90405d6ae55386bd28"


def test_chacha_counter_continuity():
    r1 = ChaChaRng(bytes(range(32)), 20)
    a = [r1.next_u32() for _ in range(100)]
    r2 = ChaChaRng(bytes(range(32)), 20)
    b = list(r2.next_u32_array(100))
    assert a == [int(x) for x in b]
    # u64 = two consecutive u32 words, lo first
    r3 = ChaChaRng(bytes(range(32)), 20)
    w0, w1 = r3.next_u32(), r3.next_u32()
    r4 = ChaChaRng(bytes(range(32)), 20)
    assert r4.next_u64() == w0 | (w1 << 32)


def test_chacha_stream_independent():
    r0 = ChaChaRng(bytes(32), 20)
    r1 = ChaChaRng(bytes(32), 20)
    r1.set_stream(1)
    assert r0.next_u64() != r1.next_u64()


def test_seed_from_u64_deterministic():
    s = seed_from_u64(1337)
    assert len(s) == 32
    assert s == seed_from_u64(1337)
    assert s != seed_from_u64(1338)


def test_uniform_usize_range():
    rng = ChaChaRng(bytes(32), 20)
    dist = UniformUsize(0, 1000)
    samples = [dist.sample(rng) for _ in range(2000)]
    assert all(0 <= s < 1000 for s in samples)
    # rough uniformity
    assert np.std(samples) > 200


def test_gen_range_and_choose_multiple():
    rng = ChaChaRng(seed_from_u64(1337), 8)
    for _ in range(100):
        v = gen_range_u64(rng, 0, 7)
        assert 0 <= v < 7
    rng = ChaChaRng(seed_from_u64(1337), 8)
    cols = choose_multiple(rng, 100, 10)
    assert len(cols) == 10
    assert len(set(cols)) == 10
    assert all(0 <= c < 100 for c in cols)
    # determinism
    rng2 = ChaChaRng(seed_from_u64(1337), 8)
    assert choose_multiple(rng2, 100, 10) == cols


def test_merlin_transcript_equivalence():
    # merlin 2.0 crate's own test vector (tests in merlin/src/transcript.rs,
    # "equivalence_simple"): protocol "test protocol", message "some data"
    # under label "some label", then 32 challenge bytes.
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    c = t.challenge_bytes(b"challenge", 32)
    assert c.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_transcript_state_equality():
    t1 = Transcript(b"proto")
    t2 = Transcript(b"proto")
    t1.append_message(b"a", b"xyz")
    t2.append_message(b"a", b"xyz")
    assert t1.state_bytes() == t2.state_bytes()
    c1 = t1.challenge_bytes(b"c", 16)
    c2 = t2.challenge_bytes(b"c", 16)
    assert c1 == c2
    assert t1.state_bytes() == t2.state_bytes()
    t1.append_message(b"b", b"1")
    assert t1.state_bytes() != t2.state_bytes()


def test_profiling_helpers():
    from lcpc_proof_of_storage_tpu.utils import profiling as prof
    rec = prof.PhaseRecorder()
    with rec.phase("cpu", actor="client"):
        pass
    with rec.phase("disk"):
        pass
    rep = rec.report()
    assert "client/cpu" in rep and rep["client/cpu"]["count"] == 1
    cost = prof.ntt_cost(128, 32768, 16, fused=True)
    r = cost.report(0.3)
    assert r["speed_of_light_ms"] > 0 and r["bound"] in ("compute", "memory")
    assert prof.hash_columns_cost(128, 32768, 32).speed_of_light_s() > 0
    assert prof.modmul_cost(1 << 20, 16).report(0.01)["fraction_of_sol"] is not None
