"""Golden regression vectors (oracle family (d), SURVEY.md §4).

The Rust reference can't run in this environment, so these pin OUR
implementation's outputs for fixed inputs: any change to field packing,
NTT convention, hashing, transcript evolution, or challenge derivation
shows up as a diff here.  Regenerate deliberately with
`python -m tests.test_golden_vectors` if a protocol change is intended.
"""

import json
from pathlib import Path

from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
from lcpc_proof_of_storage_tpu.core.commit import commit, prove
from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
from lcpc_proof_of_storage_tpu.fields.field import FT63, WRITEABLE_FT63
from lcpc_proof_of_storage_tpu.pos import online
from lcpc_proof_of_storage_tpu.utils import serde

GOLDEN = Path(__file__).parent / "golden_vectors.json"


def compute_vectors() -> dict:
    spec = FT63
    coeffs = [(i * 2654435761 + 12345) % spec.modulus for i in range(512)]
    enc = LigeroEncoding.new_from_dims(16, 64, spec)
    comm = commit(coeffs, enc)
    root = comm.get_root().root

    tr = Transcript(b"golden")
    tr.append_message(b"polycommit", root)
    x = 123456789
    inner = [pow(x, j, spec.modulus) for j in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]
    proof = prove(comm, outer, enc, tr)
    proof_blob = serde.serialize_proof(proof, spec)

    data = bytes((i * 7 + 3) % 256 for i in range(1000))
    pos_comm = online.commit_file_data(data, 8, 32, WRITEABLE_FT63)
    challenge_cols = online.get_column_indices_from_random_seed(1337, 6, 32)

    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
    # brakedown root over a fixed seed/code
    bde = BrakedownEncoding.new(512, seed=7, field=spec)
    bd_comm = commit([(i * 97 + 5) % spec.modulus for i in range(512)], bde)

    return {
        "brakedown_ft63_root": bd_comm.get_root().root.hex(),
        "ligero_ft63_root": root.hex(),
        "proof_sha": __import__("hashlib").sha256(proof_blob).hexdigest(),
        "proof_len": len(proof_blob),
        "transcript_state_sha": __import__("hashlib").sha256(tr.state_bytes()).hexdigest(),
        "pos_root": pos_comm.get_root().root.hex(),
        "challenge_cols_seed1337": challenge_cols,
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
