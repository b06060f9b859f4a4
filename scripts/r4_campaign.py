"""Round-4 TPU measurement campaign in ONE process (same machinery as
scripts/r3_campaign.py: per-item try/except, resumable JSONL results).

Round-4 focus (VERDICT.md "Next round" #1/#2/#5): measure the v3 NTT
kernel (two-kernel four-step with in-kernel transposes, built at the end
of round 3 but never run on hardware), the keep_comm="device" Brakedown
prove path, and a commit phase breakdown to locate the remaining time.

Usage:  PYTHONPATH=/root/repo python scripts/r4_campaign.py [items...]
Results: /tmp/lcpc_r4_measure/campaign.jsonl (+ stdout log)
"""

import gc
import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/lcpc_tpu_xla_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

RESULTS = os.environ.get("LCPC_CAMPAIGN_OUT",
                         "/tmp/lcpc_r4_measure/campaign.jsonl")


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


def _steady(g, *args, reps=3):
    """compile+run once, then best-of-reps seconds (forced completion via
    the int() readback of the scalar the jitted g returns)."""
    t = time.time()
    _ = int(g(*args))
    compile_s = time.time() - t
    best = 1e9
    for _ in range(reps):
        t = time.time()
        _ = int(g(*args))
        best = min(best, time.time() - t)
    return best, compile_s


@item("validate_v3")
def _validate_v3():
    """v3 kernel == XLA oracle on real hardware (ft63 + ft255, plain and
    pruned) — the round-3 tail built it but never ran it on the chip."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255
    from lcpc_proof_of_storage_tpu.fields.limb import limb_field
    from lcpc_proof_of_storage_tpu.ops.ntt import ntt
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas3 import (
        ntt_pallas3, v3_applicable, v3_device_tables)

    for spec, n, b in ((FT63, 1 << 15, 4), (FT255, 1 << 15, 2)):
        assert v3_applicable(n)
        lf = limb_field(spec)
        rnd = random.Random(0)
        vals = [[rnd.randrange(spec.modulus) for _ in range(n)]
                for _ in range(b)]
        X = jnp.stack([lf.array(v) for v in vals])
        ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(X))
        got = np.asarray(jax.jit(lambda a: ntt_pallas3(a, spec))(X))
        ok = bool(np.array_equal(got, ref))
        emit({"item": "validate_v3", "field": spec.name, "n": n, "ok": ok})
        if not ok:
            raise SystemExit(f"MISMATCH v3 {spec.name} n={n}")
        # pruned (the commit-encode hot configuration: nonzero = n/4)
        Xp = jnp.asarray(np.asarray(X).copy()).at[:, n // 4 :, :].set(0)
        refp = np.asarray(jax.jit(lambda a: ntt(a, spec))(Xp))
        tabs = v3_device_tables(spec, n, n_nonzero=n // 4)
        gotp = np.asarray(jax.jit(
            lambda a, tb: ntt_pallas3(a, spec, n_nonzero=n // 4, tables=tb)
        )(Xp, tabs))
        okp = bool(np.array_equal(gotp, refp))
        emit({"item": "validate_v3", "field": spec.name, "n": n,
              "pruned": True, "ok": okp})
        if not okp:
            raise SystemExit(f"MISMATCH v3 pruned {spec.name} n={n}")


@item("ntt_v3_micro")
def _ntt_v3_micro():
    """Raw NTT timing, v2 vs v3, at the commit-encode shapes (pruned to
    n/4 nonzero like the rho=1/4 encode): n_cols 2^15..2^18, constant
    2^22 total elements per call."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FT255
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import (
        ntt_pallas2, v2_device_tables)
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas3 import (
        ntt_pallas3, v3_device_tables)

    spec = FT255
    L = spec.num_limbs16
    rng = np.random.default_rng(0)
    for log_n in (15, 16, 17, 18):
        n = 1 << log_n
        b = (1 << 22) // n
        nz = n // 4
        xh = rng.integers(0, 1 << 16, (b, n, L), dtype=np.uint32)
        xh[:, nz:, :] = 0
        x = jnp.asarray(xh)
        tb2 = v2_device_tables(spec, n, n_nonzero=nz)
        tb3 = v3_device_tables(spec, n, n_nonzero=nz)
        g2 = jax.jit(lambda a, tb: ntt_pallas2(
            a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32))
        g3 = jax.jit(lambda a, tb: ntt_pallas3(
            a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32))
        s2, c2 = _steady(g2, x, tb2)
        s3, c3 = _steady(g3, x, tb3)
        emit({"item": "ntt_v3_micro", "n": n, "batch": b,
              "v2_s": round(s2, 4), "v3_s": round(s3, 4),
              "v2_compile_s": round(c2, 1), "v3_compile_s": round(c3, 1),
              "v3_speedup": round(s2 / s3, 3)})


@item("profile_commit20")
def _profile_commit20():
    import profile_commit
    sys.argv = ["profile_commit.py", "20"]
    profile_commit.main()
    emit({"item": "profile_commit20", "ok": True, "note": "see stdout log"})


def _bench_with_kernel(log2n, iters, kernel=None):
    import bench
    if kernel:
        os.environ["LCPC_NTT_KERNEL"] = kernel
    try:
        return bench.run_bench(log2n, "ft255", iters)
    finally:
        os.environ.pop("LCPC_NTT_KERNEL", None)


@item("bench20_v3")
def _bench20_v3():
    emit({"item": "bench20_v3", **_bench_with_kernel(20, 3, "v3")})


@item("bench24_v3")
def _bench24_v3():
    emit({"item": "bench24_v3", **_bench_with_kernel(24, 2, "v3")})


@item("bench25_v3")
def _bench25_v3():
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "bench25_v3", **_bench_with_kernel(25, 2, "v3")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)


@item("bench26_v3")
def _bench26_v3():
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "bench26_v3", **_bench_with_kernel(26, 2, "v3")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)


@item("brakedown25_dev")
def _brakedown25_dev():
    """Brakedown 2^25 with keep_comm="device": the encoded matrix stays
    HBM-resident as uint16 and prove() serves columns+paths in one fused
    gather instead of re-encoding (~2 commit-equivalents).  Target:
    prove < 2 s (VERDICT #5; ref 0.281 s from 256 GB host RAM)."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_PROTO_STREAM_BYTES"] = "2e9"
    os.environ["LCPC_PROTO_KEEP_COMM"] = "device"
    try:
        rows = run_protocol(log2s=[25], code="brakedown", iters=2)
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
        os.environ.pop("LCPC_PROTO_STREAM_BYTES", None)
        os.environ.pop("LCPC_PROTO_KEEP_COMM", None)
    for r in rows:
        emit({"item": "brakedown25_dev", **r})


@item("ligero25_dev")
def _ligero25_dev():
    """Ligero 2^25 with keep_comm="device" (encoded uint16 = 4.3 GB fits
    HBM): prove gathers instead of re-encoding."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_PROTO_KEEP_COMM"] = "device"
    try:
        rows = run_protocol(log2s=[25], iters=2)
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
        os.environ.pop("LCPC_PROTO_KEEP_COMM", None)
    for r in rows:
        emit({"item": "ligero25_dev", **r})


@item("brakedown21_r4")
def _brakedown21_r4():
    """Re-measure Brakedown 2^21 with the one-pass expander kernel
    (round-3 number predates it: commit 0.51 s vs ref 0.234 s)."""
    from bench_protocol import run_protocol
    for r in run_protocol(log2s=[21], code="brakedown", iters=3):
        emit({"item": "brakedown21_r4", **r})


@item("proto_profile20")
def _proto_profile20():
    """Measured device/host/transfer decomposition (VERDICT r3 #3)."""
    from profile_protocol import run_profile
    emit({"item": "proto_profile20", **run_profile(20, "ligero")})
    emit({"item": "proto_profile20", **run_profile(21, "brakedown")})


@item("proto_profile25_bd")
def _proto_profile25_bd():
    from profile_protocol import run_profile
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "proto_profile25_bd",
              **run_profile(25, "brakedown", keep_comm="device")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)


@item("bench27_dev")
def _bench27_dev():
    """2^27 with DEVICE-resident uint16 coeffs (4.3 GB) + v3 kernel.
    Round-3 number was 26.6 s (v2); target <= 13.4 s (dfl.txt:22)."""
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "28"
    try:
        emit({"item": "bench27_dev", **_bench_with_kernel(27, 2, "v3")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
        os.environ.pop("LCPC_BENCH_HOST_COEFF_LOG2", None)


@item("collapse_micro")
def _collapse_micro():
    """Prove is collapse-bound (proto_profile: 2.9 s of 4.4 s at Brakedown
    2^25, 87 ms of 189 ms at Ligero 2^20).  Measure the batched accumulator
    (1 GB / 4 GB transient budgets) against the one-shot fused collapse at
    the two 2^25 shapes to pick the default."""
    import types

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.core.commit import _collapse2
    from lcpc_proof_of_storage_tpu.core.streamed import collapse_streamed
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS

    spec = FIELDS["ft255"]
    n = 1 << 25
    rng = np.random.default_rng(0)
    for code, enc in (("ligero", LigeroEncoding.new(n, spec, rho=(1, 4))),
                      ("brakedown", BrakedownEncoding.new(n, 0, spec))):
        n_rows, n_per_row, _ = enc.get_dims(n)
        c16 = rng.integers(0, 1 << 16,
                           (n_rows, n_per_row, spec.num_limbs16)).astype(
                               np.uint16)
        c16[..., -1] = 0
        cm = jax.block_until_ready(jnp.asarray(c16))
        comm = types.SimpleNamespace(coeffs=cm, n_rows=n_rows,
                                     n_per_row=n_per_row)
        ta = [pow(3, i, spec.modulus) for i in range(n_rows)]
        tb = [pow(5, i, spec.modulus) for i in range(n_rows)]
        row = {"item": "collapse_micro", "code": code,
               "dims": [n_rows, n_per_row]}
        for label, fn in (
                ("batched_1g", lambda: collapse_streamed(comm, enc, [ta, tb])),
                ("batched_4g", lambda: collapse_streamed(
                    comm, enc, [ta, tb],
                    target_batch_rows=max(1, int(4e9) // (
                        2 * n_per_row * (2 * spec.num_limbs16 + 1) * 4)))),
                ("oneshot", lambda: _collapse2(cm, ta, tb, spec))):
            try:
                fn()                                        # compile
                best = 1e9
                for _ in range(2):
                    t = time.time()
                    out = fn()
                    best = min(best, time.time() - t)
                row[label + "_s"] = round(best, 4)
            except Exception as e:
                row[label + "_s"] = f"FAIL {type(e).__name__}"
                if "RESOURCE_EXHAUSTED" in str(e):
                    emit(row)
                    raise
        emit(row)
        del cm, comm
        import gc
        gc.collect()


@item("bench28_dev")
def _bench28_dev():
    """2^28 with device-resident uint16 coeffs (8.6 GB): tight HBM —
    strict per-batch sync + 256 MB batches leave room for transients."""
    os.environ["LCPC_STREAM_INFLIGHT"] = "0"
    os.environ["LCPC_STREAM_BATCH_BYTES"] = str(1 << 28)
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "29"
    try:
        emit({"item": "bench28_dev", **_bench_with_kernel(28, 1, "v3")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
        os.environ.pop("LCPC_STREAM_BATCH_BYTES", None)
        os.environ.pop("LCPC_BENCH_HOST_COEFF_LOG2", None)


@item("bench29_host")
def _bench29_host():
    """2^29 host-coeff streamed (VERDICT r3 #4: complete the BASELINE
    envelope; ref 94.6 s, dfl.txt:24).  Upload-wall bound through the
    ~35 MB/s tunnel (17 GB of uint16 coeffs cross it per iteration)."""
    emit({"item": "bench29_host", **_bench_with_kernel(29, 1, "v3")})


@item("brakedown29_host")
def _brakedown29_host():
    """Brakedown 2^29 host-coeff streamed commit (ref 38.8 s,
    sdig.txt:54)."""
    import numpy as np
    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
    from lcpc_proof_of_storage_tpu.core.streamed import commit_streamed
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS

    spec = FIELDS["ft255"]
    n = 1 << 29
    enc = BrakedownEncoding.new(n, 0, spec)
    L = spec.num_limbs16
    rng = np.random.default_rng(0)
    coeffs = rng.integers(0, 1 << 16, size=(n, L)).astype(np.uint16)
    coeffs[:, -1] = 0
    times = []
    for _ in range(2):
        t = time.time()
        c = commit_streamed(coeffs, enc, keep_comm=False, device_coeffs=False)
        _ = c.get_root().root
        times.append(round(time.time() - t, 2))
        del c
    emit({"item": "brakedown29_host", "commit_s": min(times),
          "times": times, "dims": [int(x) for x in
                                   enc.get_dims(n)]})


DEFAULT_ORDER = [
    "validate_v3", "ntt_v3_micro", "bench20_v3", "profile_commit20",
    "bench24_v3", "bench25_v3", "bench26_v3", "brakedown25_dev",
    "ligero25_dev",
]

CAMPAIGN2 = [
    "brakedown21_r4", "proto_profile20", "proto_profile25_bd",
    "bench27_dev", "ligero25_dev", "bench28_dev",
    "brakedown29_host", "bench29_host",
]

@item("collapse_validate")
def _collapse_validate():
    """One-pass collapse kernel == XLA limb-dot oracle on the real chip
    (ligero 2^20 + brakedown 2^21 shapes, ft255 + ft63), plus timing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.fields.limb import limb_field
    from lcpc_proof_of_storage_tpu.ops.collapse_pallas import collapse_tensors

    for fname, rows, npr in (("ft255", 128, 8192), ("ft255", 143, 235172),
                             ("ft255", 512, 65536), ("ft63", 100, 5000)):
        spec = FIELDS[fname]
        lf = limb_field(spec)
        rng = np.random.default_rng(rows)
        c16 = rng.integers(0, 1 << 16, (rows, npr, spec.num_limbs16)).astype(
            np.uint16)
        c16[..., -1] = 0
        t16 = rng.integers(0, 1 << 16, (2, rows, spec.num_limbs16)).astype(
            np.uint32)
        t16[..., -1] = 0
        cm = jnp.asarray(c16)
        tm = jnp.asarray(t16)
        got_fn = jax.jit(lambda c, t: collapse_tensors(c, t, spec))

        # row-chunked XLA oracle: the one-shot lf.dot's widened transient
        # is 20 GB of HLO temp at brakedown 2^25 dims (compile-time OOM) —
        # which is exactly why the kernel exists; chunk to ~1 GB
        def _ref(c, t):
            acc = None
            for r0 in range(0, c.shape[0], 16):
                part = lf.dot(c[r0 : r0 + 16].astype(jnp.uint32)[None],
                              t[:, r0 : r0 + 16, None, :], axis=1)
                acc = part if acc is None else lf.add(acc, part)
            return acc

        ref_fn = jax.jit(_ref)
        got = np.asarray(got_fn(cm, tm))
        ref = np.asarray(ref_fn(cm, tm))
        ok = bool(np.array_equal(got, ref))
        best_k = best_x = 1e9
        for _ in range(3):
            t0 = time.time()
            _ = int(np.asarray(got_fn(cm, tm))[0, 0, 0])
            best_k = min(best_k, time.time() - t0)
            t0 = time.time()
            _ = int(np.asarray(ref_fn(cm, tm))[0, 0, 0])
            best_x = min(best_x, time.time() - t0)
        emit({"item": "collapse_validate", "field": fname,
              "dims": [rows, npr], "ok": ok,
              "kernel_s": round(best_k, 4), "xla_s": round(best_x, 4)})
        if not ok:
            raise SystemExit(f"MISMATCH collapse {fname} {rows}x{npr}")


@item("proto_kernel")
def _proto_kernel():
    """Protocol latencies with the collapse kernel + packed columns:
    ligero 2^20/2^21, brakedown 2^21 (one-shot commits)."""
    from bench_protocol import run_protocol
    for r in run_protocol(log2s=[20, 21], code="ligero", iters=3):
        emit({"item": "proto_kernel", **r})
    for r in run_protocol(log2s=[21], code="brakedown", iters=3):
        emit({"item": "proto_kernel", **r})


@item("proto_kernel25")
def _proto_kernel25():
    """2^25 device-resident protocol latencies with the collapse kernel."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_PROTO_KEEP_COMM"] = "device"
    try:
        for r in run_protocol(log2s=[25], code="ligero", iters=2):
            emit({"item": "proto_kernel25", **r})
        os.environ["LCPC_PROTO_STREAM_BYTES"] = "2e9"
        for r in run_protocol(log2s=[25], code="brakedown", iters=2):
            emit({"item": "proto_kernel25", **r})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
        os.environ.pop("LCPC_PROTO_KEEP_COMM", None)
        os.environ.pop("LCPC_PROTO_STREAM_BYTES", None)


@item("proto_profile_kernel")
def _proto_profile_kernel():
    """Phase decomposition with the kernel collapse (BENCH_SUMMARY table)."""
    from profile_protocol import run_profile
    emit({"item": "proto_profile_kernel", **run_profile(20, "ligero")})
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "proto_profile_kernel",
              **run_profile(25, "brakedown", keep_comm="device")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)


@item("bench28_host")
def _bench28_host():
    """2^28 ligero with HOST-resident coefficients (the device-resident
    8.6 GB mode RESOURCE_EXHAUSTs; this mirrors the 2^29 methodology)."""
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "28"
    try:
        emit({"item": "bench28_host", **_bench_with_kernel(28, 1, "v3")})
    finally:
        os.environ.pop("LCPC_BENCH_HOST_COEFF_LOG2", None)


CAMPAIGN3 = [
    "collapse_micro", "bench28_dev", "brakedown29_host", "bench29_host",
]

@item("v3b_validate")
def _v3b_validate():
    """v3 with sliced input + in-kernel bitrev/dup (round-4b): bit-equal
    to the XLA oracle on hardware, then raw timing vs the take-pass v3."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FT255
    from lcpc_proof_of_storage_tpu.ops.ntt import ntt
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas3 import (
        ntt_pallas3, v3_device_tables)

    spec = FT255
    L = spec.num_limbs16
    rng = np.random.default_rng(0)
    for log_n in (15, 17, 18):
        n = 1 << log_n
        b = (1 << 21) // n
        nz = n // 4
        xh = rng.integers(0, 1 << 16, (b, n, L), dtype=np.uint32)
        xh[:, nz:, :] = 0
        x = jnp.asarray(xh)
        tabs = v3_device_tables(spec, n, n_nonzero=nz)
        ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
        gk = jax.jit(lambda a, tb: ntt_pallas3(
            a, spec, n_nonzero=nz, tables=tb))
        got = np.asarray(gk(x, tabs))
        ok = bool(np.array_equal(got, ref))
        emit({"item": "v3b_validate", "n": n, "ok": ok})
        if not ok:
            raise SystemExit(f"MISMATCH v3b n={n}")
        gs = jax.jit(lambda a, tb: ntt_pallas3(
            a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32))
        os.environ["LCPC_PALLAS3_INKERNEL_TAKE"] = "0"
        try:
            go = jax.jit(lambda a, tb: ntt_pallas3(
                a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32) + 0)
            s_old, _ = _steady(go, x, tabs)
        finally:
            os.environ.pop("LCPC_PALLAS3_INKERNEL_TAKE", None)
        s_new, _ = _steady(gs, x, tabs)
        emit({"item": "v3b_validate", "n": n, "v3b_s": round(s_new, 4),
              "v3_take_s": round(s_old, 4),
              "speedup": round(s_old / s_new, 3)})


@item("bench20_v3b")
def _bench20_v3b():
    emit({"item": "bench20_v3b", **_bench_with_kernel(20, 3, "v3")})


@item("bench27_tuned")
def _bench27_tuned():
    """2^27 device-coeff with 2 GB stream batches + deeper in-flight
    window: fewer per-batch dispatch/CV overheads (measured +13% at 2^26)
    chasing the 13.4 s reference anchor (r4 first pass: 15.07 s)."""
    os.environ["LCPC_STREAM_INFLIGHT"] = "2"
    os.environ["LCPC_STREAM_BATCH_BYTES"] = str(2 << 30)
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "28"
    try:
        emit({"item": "bench27_tuned", **_bench_with_kernel(27, 2, "v3")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)
        os.environ.pop("LCPC_STREAM_BATCH_BYTES", None)
        os.environ.pop("LCPC_BENCH_HOST_COEFF_LOG2", None)


@item("proto_cached25")
def _proto_cached25():
    """2^25 protocol with the packed-collapse cache (min over iters picks
    the cached prove) — rerun of proto_kernel25 after the cache landed."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_PROTO_KEEP_COMM"] = "device"
    os.environ["LCPC_PROTO_ITERS"] = "3"
    try:
        for r in run_protocol(log2s=[25], code="ligero", iters=3):
            emit({"item": "proto_cached25", **r})
        os.environ["LCPC_PROTO_STREAM_BYTES"] = "2e9"
        for r in run_protocol(log2s=[25], code="brakedown", iters=3):
            emit({"item": "proto_cached25", **r})
    finally:
        for k in ("LCPC_STREAM_INFLIGHT", "LCPC_PROTO_KEEP_COMM",
                  "LCPC_PROTO_STREAM_BYTES", "LCPC_PROTO_ITERS"):
            os.environ.pop(k, None)


@item("bench27_nz64")
def _bench27_nz64():
    """2^27 with the in-kernel take allowed at nz=64 (it compiled fine
    inside the streamed pipeline at 2^25 even though the standalone
    n=2^18 kernel hit the remote-compile 413) + the tuned stream params.
    Chasing the last 4% to the 13.4 s reference anchor (now 13.92 s)."""
    os.environ["LCPC_PALLAS3_INKERNEL_NZMAX"] = "64"
    os.environ["LCPC_STREAM_INFLIGHT"] = "2"
    os.environ["LCPC_STREAM_BATCH_BYTES"] = str(2 << 30)
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "28"
    try:
        emit({"item": "bench27_nz64", **_bench_with_kernel(27, 2, "v3")})
    finally:
        for k in ("LCPC_PALLAS3_INKERNEL_NZMAX", "LCPC_STREAM_INFLIGHT",
                  "LCPC_STREAM_BATCH_BYTES", "LCPC_BENCH_HOST_COEFF_LOG2"):
            os.environ.pop(k, None)


CAMPAIGN5 = [
    "proto_cached25", "collapse_validate", "bench27_nz64", "bench29_host",
]


CAMPAIGN4 = [
    "v3b_validate", "bench20_v3b", "collapse_validate", "proto_kernel",
    "proto_kernel25", "proto_profile_kernel", "bench27_tuned",
    "bench28_host",
]


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    names = sys.argv[1:] or DEFAULT_ORDER
    if names == ["c2"]:
        names = CAMPAIGN2
    elif names == ["c3"]:
        names = CAMPAIGN3
    elif names == ["c4"]:
        names = CAMPAIGN4
    elif names == ["c5"]:
        names = CAMPAIGN5
    t0 = time.time()
    print(f"# campaign start {time.ctime()}; items: {names}", flush=True)
    _ = int(jnp.arange(4).sum())
    print(f"# session warmup: {time.time()-t0:.0f}s on {jax.devices()[0]}",
          flush=True)

    done = set()
    errored: dict = {}
    if os.path.exists(RESULTS):                  # resume: skip finished items
        for line in open(RESULTS):
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if row.get("done"):
                done.add(row["item"])
            elif row.get("error"):
                errored[row["item"]] = errored.get(row["item"], 0) + 1

    for name in names:
        if name in done:
            print(f"### {name} already done, skip", flush=True)
            continue
        if errored.get(name, 0) >= 2:
            # two failed attempts (e.g. an OOM that also poisons the
            # backend) — don't burn retry-wrapper attempts looping on it
            print(f"### {name} errored {errored[name]}x, skip", flush=True)
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
            if "RESOURCE_EXHAUSTED" in str(e):
                # an OOM poisons the axon backend: every later device call
                # in this process fails too.  Exit nonzero so the retry
                # wrapper restarts a fresh process that resumes the
                # remaining items (campaign 2 lost its 2^29 runs to this).
                print(f"### backend poisoned by {name}; exiting for restart",
                      flush=True)
                raise SystemExit(3)
        gc.collect()
        print(f"### {name} {status} in {time.time()-t:.0f}s", flush=True)

    print(f"\n# campaign done in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
