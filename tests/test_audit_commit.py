"""Derivation-from-spec audit of the composed commit (VERDICT weak #6).

The crypto primitives are pinned to OFFICIAL vectors (blake3 / SHA3 /
ChaCha djb / merlin 2.0 — tests/test_crypto.py, test_blake3_jax.py), and
golden_vectors.json pins the composed protocol against regressions — but
golden vectors are self-generated.  This test closes the gap: it recomputes
a commitment root FROM FIRST PRINCIPLES, using only

  * python-int modular arithmetic (pow/%) for the Reed-Solomon encode —
    the NTT is evaluated as a plain DFT from the spec's root of unity,
    independent of ops/ntt*.py's butterfly pipeline;
  * the spec sentence "column hash = blake3(32 zero bytes || canonical
    little/big-endian reprs)" via crypto/blake3_ref.blake3 (the pure
    bytes-in/bytes-out implementation that passes the official blake3
    test vectors);
  * the reference Merkle layout 2*np2-1 with zero-digest padding
    (lcpc-2d/src/lib.rs:685-694, 777-815) folded by hand.

No jax, no ops/, no core/ hashing code is involved on the oracle side, so
agreement witnesses the composition itself, not a shared implementation.
"""

import random

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit
from lcpc_proof_of_storage_tpu.crypto.blake3_ref import blake3
from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255


def _dft(row, n_cols, spec):
    """Plain O(n^2) DFT: codeword[j] = sum_i row[i] * w^(i*j), w = the
    canonical n_cols-th root of unity — the definition the NTT fast path
    must equal (natural order in AND out)."""
    w = spec.nth_root_of_unity(n_cols)
    p = spec.modulus
    return [sum(c * pow(w, (i * j) % n_cols, p) for i, c in enumerate(row)) % p
            for j in range(n_cols)]


def _audit_root(coeffs, n_per_row, n_cols, spec):
    p = spec.modulus
    n_rows = (len(coeffs) + n_per_row - 1) // n_per_row
    rows = [coeffs[r * n_per_row : (r + 1) * n_per_row] for r in range(n_rows)]
    rows = [row + [0] * (n_per_row - len(row)) for row in rows]
    codewords = [_dft(row, n_cols, spec) for row in rows]

    # column leaf = blake3(32 zero bytes || column reprs), reference
    # zero-block domain separation (lcpc-2d/src/lib.rs:752-753)
    leaves = []
    for j in range(n_cols):
        msg = b"\x00" * 32 + b"".join(
            spec.to_repr(codewords[r][j]) for r in range(n_rows))
        leaves.append(blake3(msg))

    np2 = 1 << (n_cols - 1).bit_length()
    level = leaves + [b"\x00" * 32] * (np2 - n_cols)
    while len(level) > 1:
        level = [blake3(level[i] + level[i + 1])
                 for i in range(0, len(level), 2)]
    return level[0]


def test_commit_root_from_first_principles():
    for spec, n_per_row, n_cols in [(FT63, 4, 16), (FT255, 3, 8)]:
        rnd = random.Random(2026)
        coeffs = [rnd.randrange(spec.modulus) for _ in range(n_per_row * 5 - 1)]
        enc = LigeroEncoding(spec, n_per_row, n_cols)
        comm = commit(coeffs, enc)
        assert comm.get_root().root == _audit_root(
            coeffs, n_per_row, n_cols, spec), spec.name
