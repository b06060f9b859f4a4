"""Host-path PoS streaming-commit throughput (reference bench:
proof-of-storage/benches/commit_to_different_shapes_bench.rs streams a
10^9-byte file through convert_unencoded_file).

Runs on the CPU backend on purpose: the deployment model is a PCIe host
where device readback is cheap; the axon tunnel's 0.4 MB/s readback would
only measure the tunnel.  Reports MB/s plus a per-phase breakdown
(byte->limb convert, NTT encode, column hashing, limb->repr convert, IO).

Env: LCPC_STREAM_MB (default 64), LCPC_STREAM_FIELD (default ft63),
LCPC_STREAM_COLS (default 4096), LCPC_STREAM_DIR (default /dev/shm when
present).  tmpfs is the default target on purpose: this VM's virtio disk
sustains ~57 MB/s raw writeback (dd fdatasync), so a disk-backed run
measures the device, not the framework (the encoded stream is ~4.6x the
input).  On tmpfs the full pipeline (unpack -> native radix-4 Shoup NTT ->
fused transpose+Blake3+mmap scatter) is what's measured.
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/lcpc_tpu_jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lcpc_proof_of_storage_tpu.fields.field import FIELDS
from lcpc_proof_of_storage_tpu.pos import storage
from lcpc_proof_of_storage_tpu.pos.storage import EncodedFileWriter


def main() -> None:
    mb = int(os.environ.get("LCPC_STREAM_MB", "64"))
    spec = FIELDS[os.environ.get("LCPC_STREAM_FIELD", "ft63")]
    total = mb << 20
    if "LCPC_STREAM_COLS" in os.environ:
        n_cols = int(os.environ["LCPC_STREAM_COLS"])
        n_per_row = n_cols // 2
    else:
        # the PoS default shape: Square dims, rate 1/2 (lcpc_online.rs:120-129)
        from lcpc_proof_of_storage_tpu.pos.online import (
            get_aspect_ratio_default_from_file_len)
        n_per_row, n_cols, _ = get_aspect_ratio_default_from_file_len(
            total, spec)

    default_dir = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    tmp = Path(os.environ.get("LCPC_STREAM_DIR", default_dir)) / "lcpc_stream_bench"
    tmp.mkdir(exist_ok=True)
    enc_path = tmp / "bench.porenc"

    rng = np.random.default_rng(0)
    chunk = rng.integers(0, 256, size=1 << 20, dtype=np.uint8).tobytes()

    writer = EncodedFileWriter(n_per_row, n_cols, total, enc_path, spec)
    # warm the jit for the steady-state row batch: push at least one FULL
    # encode batch (a 1 MB push can be < batch_rows rows for wide generic
    # fields, leaving the first TIMED batch to pay the compile)
    warm = 0
    warm_need = writer._batch_rows() * writer.row_bytes
    while warm < max(len(chunk), warm_need):
        writer.push_bytes(chunk)
        warm += len(chunk)

    t0 = time.time()
    pushed = warm
    while pushed < total:
        writer.push_bytes(chunk)
        pushed += len(chunk)
    meta, tree = writer.finalize_to_merkle_tree()
    dt = time.time() - t0

    phases = getattr(storage, "PHASES", None)
    if phases:
        for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
            print(f"#   {k}: {v:.2f}s", file=sys.stderr)
    mbs = (total - warm) / dt / 1e6
    print(f"# {mb} MB {spec.name} cols={n_cols}: {dt:.2f}s  "
          f"rows={meta.rows_written}", file=sys.stderr)
    print({"metric": "pos_streaming_commit_MBps", "value": round(mbs, 1),
           "unit": "MB/s", "root": tree.root().hex()[:16]})
    enc_path.unlink()


if __name__ == "__main__":
    main()
