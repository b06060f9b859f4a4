"""Golden regression vectors (oracle family (d), SURVEY.md §4).

The Rust reference can't run in this environment, so these pin OUR
implementation's outputs for fixed inputs: any change to field packing,
NTT convention, hashing, transcript evolution, or challenge derivation
shows up as a diff here.  Regenerate deliberately with
`python -m tests.test_golden_vectors` if a protocol change is intended.
"""

import hashlib
import json
from pathlib import Path

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, prove
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63, FT253_192, FT255, \
    WRITEABLE_FT63
from lcpc_proof_of_storage_tpu.pos import online
from lcpc_proof_of_storage_tpu.utils import serde

GOLDEN = Path(__file__).parent / "golden_vectors.json"


def _prove_fixed(comm, enc, root, x=123456789):
    """Deterministic proof over a fixed transcript/eval point; returns
    (proof, transcript)."""
    spec = enc.spec
    tr = Transcript(b"golden")
    tr.append_message(b"polycommit", root)
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]
    return prove(comm, outer, enc, tr), tr


def compute_vectors() -> dict:
    spec = FT63
    coeffs = [(i * 2654435761 + 12345) % spec.modulus for i in range(512)]
    enc = LigeroEncoding.new_from_dims(16, 64, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root

    proof, tr = _prove_fixed(comm, enc, root)
    proof_blob = serde.serialize_proof(proof, spec)
    proof_json = json.dumps(serde.proof_to_json(proof, spec),
                            sort_keys=True).encode()

    data = bytes((i * 7 + 3) % 256 for i in range(1000))
    pos_comm = online.commit_file_data(data, 8, 32, WRITEABLE_FT63)
    challenge_cols = online.get_column_indices_from_random_seed(1337, 6, 32)

    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
    # brakedown root over a fixed seed/code
    bde = BrakedownEncoding.new(512, seed=7, field=spec)
    bd_coeffs = [(i * 97 + 5) % spec.modulus for i in range(512)]
    bd_comm = commit(bd_coeffs, bde)
    bd_proof, _ = _prove_fixed(bd_comm, bde, bd_comm.get_root().root)
    bd_blob = serde.serialize_proof(bd_proof, spec)

    # ft255 / ft253_192: pin the wide-field repr endianness (LE 32B / BE 32B)
    # through commit AND a serde'd proof — a packing regression in either
    # field flips these but not the ft63 pins (VERDICT r2 weak #6)
    v255 = {}
    for name, wspec in (("ft255", FT255), ("ft253_192", FT253_192)):
        wcoeffs = [(i * 0x9E3779B97F4A7C15 + 7) % wspec.modulus
                   for i in range(512)]
        wenc = LigeroEncoding.new_from_dims(16, 64, wspec)
        wcomm = commit(wcoeffs, wenc)
        wroot = wcomm.get_root().root
        wproof, _ = _prove_fixed(wcomm, wenc, wroot)
        wblob = serde.serialize_proof(wproof, wspec)
        v255[f"ligero_{name}_root"] = wroot.hex()
        v255[f"ligero_{name}_proof_sha"] = hashlib.sha256(wblob).hexdigest()
        v255[f"ligero_{name}_proof_len"] = len(wblob)

    # streamed commit crossing a batch boundary (batch_rows=6 does not
    # divide n_rows=16) and the device-resident packed-uint16 mode
    from lcpc_proof_of_storage_tpu.core.streamed import commit_streamed
    st = commit_streamed(coeffs, LigeroEncoding.new_from_dims(16, 64, spec),
                         target_batch_rows=6, keep_comm=False)
    st_proof, _ = _prove_fixed(st, LigeroEncoding.new_from_dims(16, 64, spec),
                               st.get_root().root)

    # wide (mesh) commit: pin the whole Merkle array, not just the root
    import jax
    import numpy as np
    from lcpc_proof_of_storage_tpu.parallel.sharded import make_mesh
    from lcpc_proof_of_storage_tpu.parallel.wide import wide_commit
    nd = 1 << (min(8, len(jax.devices())).bit_length() - 1)
    wide = wide_commit(coeffs, LigeroEncoding.new_from_dims(16, 64, spec),
                       make_mesh(nd))
    wide_hashes_sha = hashlib.sha256(
        np.ascontiguousarray(wide.hashes).tobytes()).hexdigest()

    # r5 pins (VERDICT #9): blake2b generic-digest commit root, serde
    # re-serialization stability through the packed-columns fast path, a
    # wide-mesh PROOF (not just the Merkle array), and the synthetic
    # device-generated coefficient root (seed determinism)
    b2_comm = commit(coeffs, LigeroEncoding.new_from_dims(16, 64, spec),
                     digest="blake2b")
    reser = serde.serialize_proof(
        serde.deserialize_proof(proof_blob, spec), spec)
    wide_enc = LigeroEncoding.new_from_dims(16, 64, spec).with_mesh(
        make_mesh(nd), "d")
    wide_proof, _ = _prove_fixed(wide, wide_enc, wide.get_root().root)
    wide_proof_blob = serde.serialize_proof(wide_proof, spec)
    from lcpc_proof_of_storage_tpu.core.streamed import SyntheticCoeffs
    # 256 rows x W=8 -> multi-chunk columns (the streamed regime)
    syn = commit_streamed(SyntheticCoeffs(1024, seed=42),
                          LigeroEncoding.new_from_dims(4, 16, spec),
                          target_batch_rows=100, keep_comm=False)

    return {
        "blake2b_ligero_ft63_root": b2_comm.get_root().root.hex(),
        "serde_reserialize_sha": hashlib.sha256(reser).hexdigest(),
        "wide_proof_sha": hashlib.sha256(wide_proof_blob).hexdigest(),
        "wide_proof_len": len(wide_proof_blob),
        "synthetic_seed42_root": syn.get_root().root.hex(),
        "brakedown_ft63_root": bd_comm.get_root().root.hex(),
        "ligero_ft63_root": root.hex(),
        "proof_sha": hashlib.sha256(proof_blob).hexdigest(),
        "proof_len": len(proof_blob),
        "transcript_state_sha": hashlib.sha256(tr.state_bytes()).hexdigest(),
        "pos_root": pos_comm.get_root().root.hex(),
        "challenge_cols_seed1337": challenge_cols,
        "proof_json_sha": hashlib.sha256(proof_json).hexdigest(),
        "brakedown_ft63_proof_sha": hashlib.sha256(bd_blob).hexdigest(),
        "brakedown_ft63_proof_len": len(bd_blob),
        **v255,
        "streamed_boundary_root": st.get_root().root.hex(),
        "streamed_proof_sha": hashlib.sha256(
            serde.serialize_proof(st_proof, spec)).hexdigest(),
        "wide_merkle_sha": wide_hashes_sha,
    }


def test_golden_vectors():
    got = compute_vectors()
    if not GOLDEN.exists():
        GOLDEN.write_text(json.dumps(got, indent=2))
    expect = json.loads(GOLDEN.read_text())
    assert got == expect, (
        "protocol outputs changed! If intended, delete tests/golden_vectors.json "
        "and re-run to regenerate.")


if __name__ == "__main__":
    GOLDEN.write_text(json.dumps(compute_vectors(), indent=2))
    print(f"regenerated {GOLDEN}")
