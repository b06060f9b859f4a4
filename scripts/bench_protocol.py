"""Protocol latency + proof-size bench: commit / prove / verify at several
sizes, with bincode proof bytes per size.

Mirrors the reference's pvs runs (doc/benchmark-results/
20210807_64c_255bit_ligero_dfl_pvs.txt — prove/verify/size per log2 n) and
the non_commit_benchmarks proof-size accounting
(proof-of-storage/benches/non_commit_benchmarks_with_different_file_shapes.rs:486-516).

Run on the real TPU:
  PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_protocol.py
Env: LCPC_PROTO_LOG2S (comma list, default "20"), LCPC_PROTO_FIELD (ft255),
LCPC_PROTO_CODE (ligero|brakedown), LCPC_PROTO_ITERS (3),
LCPC_PROTO_STREAM_MIN (default 25): sizes >= this commit out-of-core
(commit_streamed keep_comm=False — the encoded matrix at 2^25 ft255 is
8.5 GB, past HBM headroom next to the NTT transients) and prove via the
re-encode-on-demand column opening, matching the reference's 2^25-2^29
pvs envelope (lcpc-2d holds comm in 256 GB host RAM instead).

Prints one JSON line per size:
  {"log2n": N, "commit_s": ..., "prove_s": ..., "verify_s": ...,
   "proof_bytes": ..., "column_bytes": ..., "path_bytes": ...}
"""

import json
import os
import sys
import time


def run_protocol(log2s=None, field_name=None, code=None, iters=None,
                 stream_min=None, emit=print) -> list[dict]:
    """Measure commit/prove/verify at each size; returns the JSON dicts.
    Callable from a long-lived campaign process (scripts/r3_campaign.py)."""
    if log2s is None:
        log2s = [int(s) for s in
                 os.environ.get("LCPC_PROTO_LOG2S", "20").split(",")]
    if field_name is None:
        field_name = os.environ.get("LCPC_PROTO_FIELD", "ft255")
    if code is None:
        code = os.environ.get("LCPC_PROTO_CODE", "ligero")
    if iters is None:
        iters = int(os.environ.get("LCPC_PROTO_ITERS", "3"))

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lcpc_tpu_xla_cache")
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

    from lcpc_proof_of_storage_tpu.core.streamed import commit_streamed
    if stream_min is None:
        stream_min = int(os.environ.get("LCPC_PROTO_STREAM_MIN", "25"))

    results = []
    rnd = np.random.default_rng(0)
    for log2n in log2s:
        n = 1 << log2n
        enc = make_enc(n)
        # Stream only when the one-shot pipeline cannot hold the encoded
        # matrix + transients in 16 GB HBM.  Criterion = encoded bytes, not
        # log2n: Brakedown dims are flat (143 x 357697 at 2^25 = 3.3 GB
        # encoded -> one-shot commit + device-gather prove), while Ligero
        # 2^25 is 8.6 GB -> out-of-core.
        n_rows_est = (n + enc.n_per_row - 1) // enc.n_per_row
        encoded_bytes = n_rows_est * enc.n_cols * spec.num_limbs16 * 4
        stream_bytes = float(os.environ.get("LCPC_PROTO_STREAM_BYTES", "5e9"))
        streamed = log2n >= stream_min and encoded_bytes > stream_bytes
        # Coefficients live as a device limb array BEFORE the clock starts:
        # the reference commits from a Vec<FieldElem> already in memory
        # (benches feed ff elements, not parsed ints), so python-int
        # conversion / host->device upload is not part of its commit either.
        # Packed uint16 limbs, top limb zero => canonical (< 2^(16(L-1))).
        L = spec.num_limbs16
        coeffs16 = rnd.integers(0, 1 << 16, size=(n, L)).astype(np.uint16)
        coeffs16[:, -1] = 0
        dev_coeffs = jax.block_until_ready(jnp.asarray(coeffs16))
        if streamed:
            # keep_comm=True mirrors the reference's memory model (encoded
            # matrix in host RAM -> prove() gathers, no re-encode; this VM
            # has 125 GB).  commit_s then includes the device->host stream
            # of the encoded batches — tunnel-bandwidth-bound here, PCIe on
            # a direct-attached TPU.
            keep_env = os.environ.get("LCPC_PROTO_KEEP_COMM", "")
            keep = "device" if keep_env == "device" else keep_env == "1"
            do_commit = lambda: commit_streamed(dev_coeffs, enc,
                                                keep_comm=keep)
        else:
            do_commit = lambda: commit(dev_coeffs, enc)
        x = 0x1234567
        comm = do_commit()                  # compile
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
            # release the previous iteration's commitment BEFORE re-commit:
            # keep_comm="device" holds the encoded matrix in HBM (4.3 GB at
            # Ligero 2^25) and two live copies RESOURCE_EXHAUST a 16 GB chip
            comm = None
            t0 = time.time()
            comm = do_commit()
            # the 32 B root readback synchronizes the device pipeline (the
            # Merkle array itself stays device-resident)
            _ = comm.get_root().root
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
        row = {
            "log2n": log2n, "code": code, "field": field_name,
            "commit_s": round(min(tc), 4), "prove_s": round(min(tp), 4),
            "verify_s": round(min(tv), 4), "proof_bytes": len(blob),
            "column_bytes": col_bytes, "path_bytes": path_bytes,
            "n_col_opens": len(proof.columns),
            "dims": [comm.n_rows, comm.n_per_row, comm.n_cols],
        }
        results.append(row)
        emit(json.dumps(row))
    return results


def main() -> None:
    run_protocol()


if __name__ == "__main__":
    main()
