"""Round-3 TPU measurement campaign in ONE process.

The axon tunnel currently costs ~15 min of session warmup per PROCESS
(backend init + first readback), so the per-script queue
(run_measurement_queue.sh) pays hours of pure overhead.  This driver runs
every campaign item inside one process, guards each with try/except, and
appends results incrementally to RESULTS (JSON lines) so a tunnel death
mid-campaign loses nothing already measured.

Usage:  PYTHONPATH=/root/repo python scripts/r3_campaign.py [items...]
        (default: all items in priority order)
Results: /tmp/lcpc_r3_measure/campaign.jsonl (+ stdout log)
"""

import gc
import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lcpc_tpu_xla_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

RESULTS = os.environ.get("LCPC_CAMPAIGN_OUT",
                         "/tmp/lcpc_r3_measure/campaign.jsonl")


def emit(obj) -> None:
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print("RESULT", json.dumps(obj), flush=True)


def item(name):
    def deco(fn):
        ITEMS[name] = fn
        return fn
    return deco


ITEMS: dict = {}


@item("validate")
def _validate():
    """Kernel + packed-expander equality vs XLA oracles (exits nonzero on
    mismatch -> re-raise so the campaign records the failure loudly)."""
    import tpu_validate_bench
    sys.argv = ["tpu_validate_bench.py", "18"]
    tpu_validate_bench.main()
    emit({"item": "validate", "ok": True})


@item("proto_ligero")
def _proto_ligero():
    from bench_protocol import run_protocol
    rows = run_protocol(log2s=[20, 21], iters=3)
    for r in rows:
        emit({"item": "proto_ligero", **r})


@item("bench20")
def _bench20():
    import bench
    emit({"item": "bench20", **bench.run_bench(20, "ft255", 3)})


@item("brakedown21")
def _brakedown21():
    from bench_protocol import run_protocol
    rows = run_protocol(log2s=[21], code="brakedown", iters=2)
    for r in rows:
        emit({"item": "brakedown21", **r})


@item("bench24")
def _bench24():
    import bench
    emit({"item": "bench24", **bench.run_bench(24, "ft255", 2)})


@item("bench25")
def _bench25():
    import bench
    emit({"item": "bench25", **bench.run_bench(25, "ft255", 2)})


@item("bench26")
def _bench26():
    import bench
    emit({"item": "bench26", **bench.run_bench(26, "ft255", 2)})


@item("brakedown25")
def _brakedown25():
    from bench_protocol import run_protocol
    rows = run_protocol(log2s=[25], code="brakedown", iters=2)
    for r in rows:
        emit({"item": "brakedown25", **r})


@item("proto_ligero25")
def _proto_ligero25():
    from bench_protocol import run_protocol
    rows = run_protocol(log2s=[25], iters=2)
    for r in rows:
        emit({"item": "proto_ligero25", **r})


@item("fourstep_bench")
def _fourstep_bench():
    """Commit throughput with the four-step NTT (two VMEM-resident sub-NTT
    passes instead of the per-large-stage HBM pipeline)."""
    import bench
    os.environ["LCPC_NTT_FOURSTEP"] = "1"
    try:
        for lg, iters in ((20, 3), (24, 2), (25, 2), (26, 2)):
            emit({"item": f"fourstep_bench{lg}",
                  **bench.run_bench(lg, "ft255", iters)})
    finally:
        os.environ.pop("LCPC_NTT_FOURSTEP", None)


@item("bench27_dev")
def _bench27_dev():
    """2^27 with DEVICE-resident packed coefficients (4.3 GB uint16 fits
    HBM beside the batch transients): the one-time upload stays outside the
    timed loop, matching how the reference's bench holds its coefficients
    in RAM.  The default host-coeff mode pays the ~15 MB/s tunnel upload
    every iteration (305 s at 2^27)."""
    import bench
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "28"
    os.environ["LCPC_NTT_FOURSTEP"] = "1"
    try:
        emit({"item": "bench27_dev", **bench.run_bench(27, "ft255", 2)})
    finally:
        os.environ.pop("LCPC_BENCH_HOST_COEFF_LOG2", None)
        os.environ.pop("LCPC_NTT_FOURSTEP", None)


@item("proto_ligero25_keep")
def _proto_ligero25_keep():
    """2^25 with the reference's memory model: keep_comm=True streams the
    encoded matrix to host RAM (125 GB here), prove gathers instead of
    re-encoding.  commit_s then includes the encoded stream's device->host
    leg (tunnel-bound; PCIe on direct-attached hardware)."""
    from bench_protocol import run_protocol
    os.environ["LCPC_PROTO_KEEP_COMM"] = "1"
    try:
        rows = run_protocol(log2s=[25], iters=2)
    finally:
        os.environ.pop("LCPC_PROTO_KEEP_COMM", None)
    for r in rows:
        emit({"item": "proto_ligero25_keep", **r})


@item("brakedown25_inflight")
def _brakedown25_inflight():
    """Brakedown 2^25 streamed commit with a 1-deep in-flight batch window
    (pipeline the per-batch sync; HBM holds coeffs 1.07 GB + 2 batches)."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        rows = run_protocol(log2s=[25], code="brakedown", iters=2)
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
    for r in rows:
        emit({"item": "brakedown25_inflight", **r})


@item("bench26_inflight")
def _bench26_inflight():
    import bench
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "bench26_inflight", **bench.run_bench(26, "ft255", 2)})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)


@item("profile_streamed")
def _profile_streamed():
    """Phase breakdown of one 2^26-class streamed batch: encode alone vs
    encode + repr/transpose + chunk-CVs — how much the streaming machinery
    adds on top of the raw NTT."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.core.commit import _encode_matrix
    from lcpc_proof_of_storage_tpu.fields.field import FT255
    from lcpc_proof_of_storage_tpu.ops.blake3_jax import (
        chunk_cvs_words, limbs_to_repr_words)

    spec = FT255
    n = 1 << 26
    enc = LigeroEncoding.new(n, spec, rho=(1, 4))
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    L = spec.num_limbs16
    W = spec.repr_bytes
    rows_b = max(1, min(1024, (1 << 30) // (n_cols * L * 4)))
    rng = np.random.default_rng(0)
    cm = jnp.asarray(rng.integers(0, 1 << 16, (rows_b, n_per_row, L),
                                  dtype=np.uint32))
    ops = enc.device_operands()
    k = (rows_b * W + 1023) // 1024

    def enc_only(c, o):
        return _encode_matrix(c, enc, n_cols, o).sum(dtype=jnp.uint32)

    def enc_cv(c, o, counters):
        comm_b = _encode_matrix(c, enc, n_cols, o)
        words = limbs_to_repr_words(comm_b, spec)
        words = jnp.transpose(words, (1, 0, 2)).reshape(n_cols, -1)
        pad = k * 256 - rows_b * W // 4
        if pad:
            words = jnp.pad(words, ((0, 0), (0, pad)))
        return chunk_cvs_words(words, counters, 1024).sum(dtype=jnp.uint32)

    out = {"item": "profile_streamed", "rows_b": rows_b,
           "n_batches": -(-n_rows // rows_b)}
    counters = jnp.arange(k, dtype=jnp.uint32)
    for name, g, args in (
            ("encode_batch_s", jax.jit(enc_only), (cm, ops)),
            ("encode_cv_batch_s", jax.jit(enc_cv), (cm, ops, counters))):
        _ = int(g(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            _ = int(g(*args))
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    emit(out)


@item("bench27_dev2")
def _bench27_dev2():
    """bench27_dev without the four-step kernel (measured slower)."""
    import bench
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "28"
    try:
        emit({"item": "bench27_dev2", **bench.run_bench(27, "ft255", 2)})
    finally:
        os.environ.pop("LCPC_BENCH_HOST_COEFF_LOG2", None)


@item("brakedown25_streamed")
def _brakedown25_streamed():
    """Brakedown 2^25 via the streamed commit + in-flight window (the
    one-shot attempt RESOURCE_EXHAUSTED: encoded 3.3 GB + expander gather
    transients exceed 16 GB HBM)."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_PROTO_STREAM_BYTES"] = "2e9"
    try:
        rows = run_protocol(log2s=[25], code="brakedown", iters=2)
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
        os.environ.pop("LCPC_PROTO_STREAM_BYTES", None)
    for r in rows:
        emit({"item": "brakedown25_streamed", **r})


@item("tunnel_probe")
def _tunnel_probe():
    """Measure the axon tunnel's host->device / device->host bandwidth and
    dispatch latency so BENCH_SUMMARY can separate framework cost from
    tunnel artifacts (prove/verify are transfer-bound through the tunnel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.jit(lambda v: v + 1)
    tiny = jnp.zeros(8, jnp.uint32)
    _ = int(np.asarray(dev(tiny))[0])
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        _ = int(np.asarray(dev(tiny))[0])
    lat = (time.time() - t0) / reps
    out = {"item": "tunnel_probe", "dispatch_roundtrip_s": round(lat, 4)}
    for mb in (4, 32, 128):
        a = np.random.default_rng(0).integers(
            0, 255, mb << 20, dtype=np.uint8)
        t0 = time.time()
        d = jnp.asarray(a)
        _ = int(np.asarray(dev(d[:8].astype(jnp.uint32)))[0])  # force upload
        up = time.time() - t0
        t0 = time.time()
        _ = np.asarray(d)
        down = time.time() - t0
        out[f"up_MBps_{mb}"] = round(mb / max(up - lat, 1e-9), 1)
        out[f"down_MBps_{mb}"] = round(mb / max(down, 1e-9), 1)
        del d
    emit(out)


@item("mxu_probe")
def _mxu_probe():
    import microbench_mxu
    microbench_mxu.main()
    emit({"item": "mxu_probe", "ok": True, "note": "see stdout log"})


@item("bench27")
def _bench27():
    import bench
    emit({"item": "bench27", **bench.run_bench(27, "ft255", 2)})


@item("profile_proto")
def _profile_proto():
    import profile_protocol
    sys.argv = ["profile_protocol.py", "20"]
    profile_protocol.main()
    emit({"item": "profile_proto", "ok": True, "note": "see stdout log"})


DEFAULT_ORDER = [
    "validate", "proto_ligero", "bench20", "brakedown21", "bench24",
    "bench25", "bench26", "brakedown25", "proto_ligero25", "mxu_probe",
    "bench27", "profile_proto",
]


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    names = sys.argv[1:] or DEFAULT_ORDER
    t0 = time.time()
    print(f"# campaign start {time.ctime()}; items: {names}", flush=True)
    _ = int(jnp.arange(4).sum())
    print(f"# session warmup: {time.time()-t0:.0f}s on {jax.devices()[0]}",
          flush=True)

    done = set()
    if os.path.exists(RESULTS):                  # resume: skip finished items
        for line in open(RESULTS):
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if row.get("done"):
                done.add(row["item"])

    for name in names:
        if name in done:
            print(f"### {name} already done, skip", flush=True)
            continue
        t = time.time()
        print(f"\n### {name} start {time.ctime()}", flush=True)
        try:
            ITEMS[name]()
            status = "ok"
            emit({"item": name, "done": True,
                  "secs": round(time.time() - t, 1)})
        except BaseException as e:              # incl. SystemExit from validate
            status = f"FAIL {type(e).__name__}: {e}"
            traceback.print_exc()
            emit({"item": name, "error": str(e)})
        gc.collect()
        print(f"### {name} {status} in {time.time()-t:.0f}s", flush=True)

    print(f"\n# campaign done in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
