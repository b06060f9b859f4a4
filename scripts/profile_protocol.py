"""Measured phase decomposition of prove() and verify() on the real TPU.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/profile_protocol.py \
           [log2n] [ligero|brakedown] [keep_comm]

Uses the phase spans wired into core/commit.py (utils/profiling) with
LCPC_PROFILE_PROTO=1, which splits the device-execute and transfer legs by
forcing a 4-byte sync between them (each split adds one ~32 ms tunnel
dispatch — subtract it when reading the table).  Produces the
device-ms / host-ms / transfer-ms columns for BENCH_SUMMARY (VERDICT r3
next-round #3) and the PCIe-extrapolated latency (device + host with ~us
dispatch instead of the tunnel's 32 ms).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/lcpc_tpu_xla_cache")
os.environ["LCPC_PROFILE_PROTO"] = "1"

TRANSFER = {"open_readback", "upload", "readback"}
DEVICE = {"collapse", "open_device", "device"}


def run_profile(log2n=20, code="ligero", keep_comm=None, emit=print):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.core import commit as C
    from lcpc_proof_of_storage_tpu.core.streamed import commit_streamed
    from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.utils.profiling import GLOBAL_PHASES

    spec = FIELDS["ft255"]
    n = 1 << log2n
    if code == "ligero":
        from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
        enc = LigeroEncoding.new(n, spec, rho=(1, 4))
    else:
        from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
        enc = BrakedownEncoding.new(n, 0, spec)
    rnd = np.random.default_rng(0)
    coeffs16 = rnd.integers(0, 1 << 16, size=(n, spec.num_limbs16)).astype(
        np.uint16)
    coeffs16[:, -1] = 0
    _ = int(jnp.arange(4).sum())
    dev_coeffs = jnp.asarray(coeffs16)
    if keep_comm is not None:
        comm = commit_streamed(dev_coeffs, enc, keep_comm=keep_comm)
    else:
        comm = C.commit(dev_coeffs, enc)
    root = comm.get_root().root
    x = 0x1234567
    inner = [pow(x, i, spec.modulus) for i in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]

    def fresh_tr():
        tr = Transcript(b"profile")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return tr

    # warm the jits
    pf = C.prove(comm, outer, enc, fresh_tr())
    C.verify(root, outer, inner, pf, enc, fresh_tr())

    out = {"log2n": log2n, "code": code, "keep_comm": str(keep_comm)}
    for op, fn in (
            ("prove", lambda: C.prove(comm, outer, enc, fresh_tr())),
            ("verify", lambda: C.verify(root, outer, inner, pf, enc,
                                        fresh_tr()))):
        GLOBAL_PHASES.totals.clear()
        GLOBAL_PHASES.counts.clear()
        t0 = time.time()
        fn()
        total = time.time() - t0
        spans = {b: t for (a, b), t in GLOBAL_PHASES.totals.items()
                 if a == op}
        dev = sum(t for b, t in spans.items() if b in DEVICE)
        xfer = sum(t for b, t in spans.items() if b in TRANSFER)
        host = sum(t for b, t in spans.items()
                   if b not in DEVICE and b not in TRANSFER)
        out[op] = {
            "total_ms": round(total * 1e3, 1),
            "device_ms": round(dev * 1e3, 1),
            "transfer_ms": round(xfer * 1e3, 1),
            "host_ms": round(host * 1e3, 1),
            "other_ms": round((total - dev - xfer - host) * 1e3, 1),
            "phases_ms": {b: round(t * 1e3, 1)
                          for b, t in sorted(spans.items(),
                                             key=lambda kv: -kv[1])},
        }
    emit(json.dumps(out))
    return out


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    code = sys.argv[2] if len(sys.argv) > 2 else "ligero"
    keep = sys.argv[3] if len(sys.argv) > 3 else None
    run_profile(log2n, code, keep)


if __name__ == "__main__":
    main()
