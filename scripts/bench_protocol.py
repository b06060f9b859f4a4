"""Protocol latency + proof-size bench: commit / prove / verify at several
sizes, with bincode proof bytes per size.

Mirrors the reference's pvs runs (doc/benchmark-results/
20210807_64c_255bit_ligero_dfl_pvs.txt — prove/verify/size per log2 n) and
the non_commit_benchmarks proof-size accounting
(proof-of-storage/benches/non_commit_benchmarks_with_different_file_shapes.rs:486-516).

Run on the real TPU:
  PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_protocol.py
Env: LCPC_PROTO_LOG2S (comma list, default "20"), LCPC_PROTO_FIELD (ft255),
LCPC_PROTO_CODE (ligero|brakedown), LCPC_PROTO_ITERS (3).

Prints one JSON line per size:
  {"log2n": N, "commit_s": ..., "prove_s": ..., "verify_s": ...,
   "proof_bytes": ..., "column_bytes": ..., "path_bytes": ...}
"""

import json
import os
import sys
import time


def main() -> None:
    log2s = [int(s) for s in
             os.environ.get("LCPC_PROTO_LOG2S", "20").split(",")]
    field_name = os.environ.get("LCPC_PROTO_FIELD", "ft255")
    code = os.environ.get("LCPC_PROTO_CODE", "ligero")
    iters = int(os.environ.get("LCPC_PROTO_ITERS", "3"))

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lcpc_tpu_xla_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from lcpc_proof_of_storage_tpu.core.commit import commit, prove, verify
    from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.utils.serde import (
        serialize_column, serialize_proof)

    spec = FIELDS[field_name]
    if code == "ligero":
        from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
        make_enc = lambda n: LigeroEncoding.new(n, spec, rho=(1, 4))
    else:
        from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
        make_enc = lambda n: BrakedownEncoding.new(n, 0, spec)

    print(f"# protocol bench {code}/{field_name} on {jax.devices()[0]}",
          file=sys.stderr)
    t0 = time.time()
    import jax.numpy as jnp
    _ = int(jnp.arange(4).sum())
    print(f"# warmup readback {time.time()-t0:.1f}s", file=sys.stderr)

    rnd = np.random.default_rng(0)
    for log2n in log2s:
        n = 1 << log2n
        enc = make_enc(n)
        # random coefficients below 2^63 (valid for every field)
        coeffs = [int(x) for x in rnd.integers(0, 1 << 62, size=n, dtype=np.int64)]
        x = 0x1234567
        comm = commit(coeffs, enc)          # compile
        root = comm.get_root().root
        inner = [1] * comm.n_per_row
        cur = 1
        for i in range(comm.n_per_row):
            inner[i] = cur
            cur = (cur * x) % spec.modulus
        xr = pow(x, comm.n_per_row, spec.modulus)
        outer = [1] * comm.n_rows
        cur = 1
        for i in range(comm.n_rows):
            outer[i] = cur
            cur = (cur * xr) % spec.modulus

        def fresh_tr():
            tr = Transcript(b"bench transcript")
            tr.append_message(b"polycommit", root)
            tr.append_message(b"ncols",
                              enc.get_n_col_opens().to_bytes(8, "little"))
            return tr

        proof = prove(comm, outer, enc, fresh_tr())      # compile
        verify(root, outer, inner, proof, enc, fresh_tr())  # compile

        tc, tp, tv = [], [], []
        for _ in range(iters):
            t0 = time.time()
            comm = commit(coeffs, enc)
            _ = comm.get_root().root            # forces full readback
            tc.append(time.time() - t0)
            t0 = time.time()
            proof = prove(comm, outer, enc, fresh_tr())
            tp.append(time.time() - t0)
            t0 = time.time()
            res = verify(root, outer, inner, proof, enc, fresh_tr())
            tv.append(time.time() - t0)
        # Horner oracle on a subsample is too slow at 2^24; check vs collapse
        assert res == sum(t * e for t, e in
                          zip(inner, proof.p_eval)) % spec.modulus

        blob = serialize_proof(proof, spec)
        col_bytes = sum(
            len(c.col) * spec.repr_bytes for c in proof.columns)
        path_bytes = sum(32 * len(c.path) for c in proof.columns)
        print(json.dumps({
            "log2n": log2n, "code": code, "field": field_name,
            "commit_s": round(min(tc), 4), "prove_s": round(min(tp), 4),
            "verify_s": round(min(tv), 4), "proof_bytes": len(blob),
            "column_bytes": col_bytes, "path_bytes": path_bytes,
            "n_col_opens": len(proof.columns),
            "dims": [comm.n_rows, comm.n_per_row, comm.n_cols],
        }))


if __name__ == "__main__":
    main()
