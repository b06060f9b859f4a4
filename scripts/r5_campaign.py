"""Round-5 TPU measurement campaign (one process, resumable JSONL; same
machinery as r4_campaign — items registered into its table).

Round-5 focus (VERDICT r4 "Next round"):
  #1 prove/verify with the natural-layout collapse kernel (no first-proof
     relayout) + the r5 host-leg fixes — targets: ligero 2^20 prove <= 45 ms
     and 2^25 <= 0.14 s excl. tunnel transfer; brakedown 2^25 prove <= 0.3 s
     excl. transfer, verify host < 100 ms.
  #2 Ligero 2^27 < 13.4 s with the in-kernel bitrev take unlocked at nz=64
     (compact fori_loop shuffle; gate now 256).
  #3 the 2^29 Ligero cell: synthetic device-generated coefficients
     (compute envelope) + a chunk-watchdogged host-coeff attempt.
  #4 per-kernel roofline table (v3b A/B, collapse, expander, blake3).
  #7 Blake2b commit microbench at 2^16 vs the reference's committed table
     (doc/benchmark-results/sdig-ligero-isz-microbenchmarks).

Usage:  PYTHONPATH=/root/repo python scripts/r5_campaign.py [items...|r5]
Results: /tmp/lcpc_r5_measure/campaign.jsonl
"""

import os
import sys
import time

os.environ.setdefault("LCPC_CAMPAIGN_OUT",
                      "/tmp/lcpc_r5_measure/campaign.jsonl")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import r4_campaign as r4                                    # noqa: E402
from r4_campaign import _steady, emit, item                 # noqa: E402


@item("r5_validate")
def _r5_validate():
    """Bit-equality of the two new r5 device paths on real hardware:
    (a) natural-layout collapse kernel (default) vs the XLA limb-dot
        oracle, incl. a >2048-row shape that exercises chunk partials;
    (b) v3b with the compact fori_loop bitrev take at nz_rows=64 (the
        variant whose unrolled form tripped the remote-compile 413)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.fields.limb import limb_field
    from lcpc_proof_of_storage_tpu.ops.collapse_pallas import (
        collapse_tensors_natural)

    # (a) natural collapse
    for fname, rows, npr in (("ft255", 128, 8192), ("ft255", 4096, 4096),
                             ("ft63", 100, 5000)):
        spec = FIELDS[fname]
        lf = limb_field(spec)
        rng = np.random.default_rng(rows)
        c16 = rng.integers(0, 1 << 16, (rows, npr, spec.num_limbs16)).astype(
            np.uint16)
        c16[..., -1] = 0
        t16 = rng.integers(0, 1 << 16, (2, rows, spec.num_limbs16)).astype(
            np.uint32)
        t16[..., -1] = 0
        cm, tm = jnp.asarray(c16), jnp.asarray(t16)
        got = np.asarray(jax.jit(
            lambda c, t: collapse_tensors_natural(c, t, spec))(cm, tm))

        def _ref(c, t):
            acc = None
            for r0 in range(0, c.shape[0], 16):
                part = lf.dot(c[r0:r0 + 16].astype(jnp.uint32)[None],
                              t[:, r0:r0 + 16, None, :], axis=1)
                acc = part if acc is None else lf.add(acc, part)
            return acc

        ref = np.asarray(jax.jit(_ref)(cm, tm))
        ok = bool(np.array_equal(got, ref))
        emit({"item": "r5_validate", "what": "collapse_natural",
              "field": fname, "dims": [rows, npr], "ok": ok})
        if not ok:
            raise SystemExit(f"MISMATCH natural collapse {fname} "
                             f"{rows}x{npr}")

    # (b) v3b loop-bitrev take at n = 2^18 (nz_rows = 64)
    from lcpc_proof_of_storage_tpu.fields.field import FT255
    from lcpc_proof_of_storage_tpu.ops.ntt import ntt
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas3 import (
        ntt_pallas3, v3_device_tables)
    spec = FT255
    L = spec.num_limbs16
    rng = np.random.default_rng(0)
    n, b = 1 << 18, 8
    nz = n // 4
    xh = rng.integers(0, 1 << 16, (b, n, L), dtype=np.uint32)
    xh[:, nz:, :] = 0
    x = jnp.asarray(xh)
    tabs = v3_device_tables(spec, n, n_nonzero=nz)
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(x))
    gk = jax.jit(lambda a, tb: ntt_pallas3(a, spec, n_nonzero=nz, tables=tb))
    got = np.asarray(gk(x, tabs))
    ok = bool(np.array_equal(got, ref))
    emit({"item": "r5_validate", "what": "v3b_loop_bitrev_nz64",
          "n": n, "ok": ok})
    if not ok:
        raise SystemExit("MISMATCH v3b loop bitrev n=2^18")
    # timing: loop-take variant vs take-outside fallback
    gs = jax.jit(lambda a, tb: ntt_pallas3(
        a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32))
    s_new, _ = _steady(gs, x, tabs)
    os.environ["LCPC_PALLAS3_INKERNEL_TAKE"] = "0"
    try:
        go = jax.jit(lambda a, tb: ntt_pallas3(
            a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32) + 0)
        s_old, _ = _steady(go, x, tabs)
    finally:
        os.environ.pop("LCPC_PALLAS3_INKERNEL_TAKE", None)
    emit({"item": "r5_validate", "what": "v3b_loop_bitrev_nz64",
          "n": n, "inkernel_s": round(s_new, 4),
          "take_outside_s": round(s_old, 4),
          "speedup": round(s_old / s_new, 3)})


@item("collapse_nat_micro")
def _collapse_nat_micro():
    """Natural-layout collapse vs packed (pack + collapse, then cached
    collapse alone) at the two protocol-critical shapes.  The natural
    kernel's pitch: no per-commitment relayout, uint16 input at half
    HBM width."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.ops.collapse_pallas import (
        collapse_tensors, collapse_tensors_natural, pack_coeffs)

    spec = FIELDS["ft255"]
    for label, rows, npr in (("ligero20", 128, 8192),
                             ("brakedown25", 143, 235172),
                             ("ligero25", 724, 46341)):
        rng = np.random.default_rng(rows)
        c16 = rng.integers(0, 1 << 16, (rows, npr, spec.num_limbs16)).astype(
            np.uint16)
        c16[..., -1] = 0
        t16 = rng.integers(0, 1 << 16, (2, rows, spec.num_limbs16)).astype(
            np.uint32)
        t16[..., -1] = 0
        cm = jax.block_until_ready(jnp.asarray(c16))
        tm = jnp.asarray(t16)
        row = {"item": "collapse_nat_micro", "shape": label,
               "dims": [rows, npr]}
        g_nat = jax.jit(lambda c, t: collapse_tensors_natural(
            c, t, spec).sum(dtype=jnp.uint32))
        s_nat, c_nat = _steady(g_nat, cm, tm)
        row["natural_s"] = round(s_nat, 4)
        row["natural_compile_s"] = round(c_nat, 1)
        try:
            cu32 = cm.astype(jnp.uint32)         # packed path wants uint32
            t0 = time.time()
            packed = jax.block_until_ready(pack_coeffs(cu32, spec))
            pack_s = time.time() - t0
            g_pk = jax.jit(lambda c, t, pk: collapse_tensors(
                c, t, spec, packed=pk).sum(dtype=jnp.uint32))
            s_pk, _ = _steady(g_pk, cu32, tm, packed)
            row["pack_s"] = round(pack_s, 4)
            row["packed_collapse_s"] = round(s_pk, 4)
        except Exception as e:  # noqa: BLE001 — micro item, keep campaign alive
            row["packed_error"] = f"{type(e).__name__}: {e}"
        emit(row)
        del cm
        import gc
        gc.collect()


@item("proto_r5")
def _proto_r5():
    """Protocol latencies with the natural collapse + r5 host-leg fixes:
    ligero 2^20/2^21, brakedown 2^21 (one-shot commits)."""
    from bench_protocol import run_protocol
    for r in run_protocol(log2s=[20, 21], code="ligero", iters=3):
        emit({"item": "proto_r5", **r})
    for r in run_protocol(log2s=[21], code="brakedown", iters=3):
        emit({"item": "proto_r5", **r})


@item("proto_r5_25")
def _proto_r5_25():
    """2^25 device-resident protocol latencies, natural collapse."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_PROTO_KEEP_COMM"] = "device"
    try:
        for r in run_protocol(log2s=[25], code="ligero", iters=3):
            emit({"item": "proto_r5_25", **r})
        os.environ["LCPC_PROTO_STREAM_BYTES"] = "2e9"
        for r in run_protocol(log2s=[25], code="brakedown", iters=3):
            emit({"item": "proto_r5_25", **r})
    finally:
        for k in ("LCPC_STREAM_INFLIGHT", "LCPC_PROTO_KEEP_COMM",
                  "LCPC_PROTO_STREAM_BYTES"):
            os.environ.pop(k, None)


@item("proto_profile_r5")
def _proto_profile_r5():
    """Phase decomposition with natural collapse (BENCH_SUMMARY table)."""
    from profile_protocol import run_profile
    emit({"item": "proto_profile_r5", **run_profile(20, "ligero")})
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "proto_profile_r5",
              **run_profile(25, "brakedown", keep_comm="device")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)


@item("bench20_r5")
def _bench20_r5():
    emit({"item": "bench20_r5", **r4._bench_with_kernel(20, 3, "v3")})


@item("bench27_r5")
def _bench27_r5():
    """2^27 with the in-kernel take now DEFAULT at nz=64 (gate 256) +
    tuned stream params.  Target: < 13.4 s (dfl.txt:22; r4 best 13.92)."""
    os.environ["LCPC_STREAM_INFLIGHT"] = "2"
    os.environ["LCPC_STREAM_BATCH_BYTES"] = str(2 << 30)
    os.environ["LCPC_BENCH_HOST_COEFF_LOG2"] = "28"
    try:
        emit({"item": "bench27_r5", **r4._bench_with_kernel(27, 2, "v3")})
    finally:
        for k in ("LCPC_STREAM_INFLIGHT", "LCPC_STREAM_BATCH_BYTES",
                  "LCPC_BENCH_HOST_COEFF_LOG2"):
            os.environ.pop(k, None)


@item("bench29_synth")
def _bench29_synth():
    """Ligero 2^29 compute envelope: coefficients generated ON DEVICE per
    batch from a seed (SyntheticCoeffs) — no 17 GB host upload.  Fills
    the last empty BASELINE cell (ref 94.6 s, dfl.txt:24); clearly
    labeled synthetic in the metric name."""
    os.environ["LCPC_BENCH_SYNTH"] = "1"
    os.environ["LCPC_STREAM_INFLIGHT"] = "2"
    os.environ["LCPC_STREAM_BATCH_BYTES"] = str(2 << 30)
    try:
        emit({"item": "bench29_synth", **r4._bench_with_kernel(29, 2, "v3")})
    finally:
        for k in ("LCPC_BENCH_SYNTH", "LCPC_STREAM_INFLIGHT",
                  "LCPC_STREAM_BATCH_BYTES"):
            os.environ.pop(k, None)


@item("bench27_synth")
def _bench27_synth():
    """2^27 synthetic device-coeff run: cross-checks the synthetic mode
    against the measured host/device-coeff 2^27 numbers (the synthetic
    overhead should be ~the per-batch coeff-generation cost)."""
    os.environ["LCPC_BENCH_SYNTH"] = "1"
    os.environ["LCPC_STREAM_INFLIGHT"] = "2"
    os.environ["LCPC_STREAM_BATCH_BYTES"] = str(2 << 30)
    try:
        emit({"item": "bench27_synth", **r4._bench_with_kernel(27, 2, "v3")})
    finally:
        for k in ("LCPC_BENCH_SYNTH", "LCPC_STREAM_INFLIGHT",
                  "LCPC_STREAM_BATCH_BYTES"):
            os.environ.pop(k, None)


@item("blake2b_micro")
def _blake2b_micro():
    """Reference parity point: commit at n=2^16, ft255, Blake2b digest,
    Brakedown codes 1-6 (doc/benchmark-results/
    sdig-ligero-isz-microbenchmarks: 23-37 ms at 32c, 63-85 ms at 1c).
    This = TPU encode + native batched host Blake2b.  Blake3 same shape
    included for the device-hash comparison."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
    from lcpc_proof_of_storage_tpu.core.commit import commit
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.ops.expander import SDIG_CODES

    spec = FIELDS["ft255"]
    n = 1 << 16
    rng = np.random.default_rng(0)
    ch = rng.integers(0, 1 << 16, (n, spec.num_limbs16), dtype=np.uint32)
    ch[:, -1] = 0
    coeffs = jax.block_until_ready(jnp.asarray(ch))
    for ci, code in enumerate(SDIG_CODES, 1):
        enc = BrakedownEncoding.new(n, 0, spec, code)
        for digest in ("blake2b", "blake3"):
            best = 1e9
            for _ in range(4):
                t0 = time.time()
                c = commit(coeffs, enc, digest=digest)
                _ = c.get_root().root
                best = min(best, time.time() - t0)
            row = {"item": "blake2b_micro", "code": ci, "digest": digest,
                   "commit_s": round(best, 4)}
            if digest == "blake2b":
                # decomposition: the commit is tunnel-readback bound here;
                # time the host hash+merkle leg alone on the already-read
                # comm (the leg the reference's 2^16 table measures on 32c)
                from lcpc_proof_of_storage_tpu.crypto.digest import (
                    column_leaves_host, get_digest, merkle_tree_host)
                comm_np = np.asarray(c.comm)
                d = get_digest("blake2b")
                t0 = time.time()
                leaves = column_leaves_host(comm_np, spec, d)
                _ = merkle_tree_host(leaves, c.n_cols, d)
                row["host_hash_s"] = round(time.time() - t0, 4)
                row["comm_mb"] = round(comm_np.nbytes / 1e6, 1)
            emit(row)


@item("roofline_r5")
def _roofline_r5():
    """Per-kernel achieved vs speed-of-light (VERDICT #4): v3b kernels A
    and B individually (real tables, random input — timing only), the
    full v3b NTT, the natural collapse kernel, the one-pass expander
    encode, and the blake3 column-hash kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.utils.profiling import (
        V5E, KernelCost, hash_columns_cost, ntt_cost)

    spec = FIELDS["ft255"]
    L = spec.num_limbs16
    rng = np.random.default_rng(0)

    # --- v3b NTT: full + kernels A/B at the 2^20 and 2^27 commit shapes
    from lcpc_proof_of_storage_tpu.ops import ntt_pallas3 as p3
    for n, batch in ((1 << 15, 128), (1 << 17, 16)):
        nz = n // 4
        t = p3._v3_tables_np(spec, n, nz)
        n1, n2, skip = t["n1"], t["n2"], t["skip"]
        tabs = p3.v3_device_tables(spec, n, n_nonzero=nz)
        xh = rng.integers(0, 1 << 16, (batch, n, L), dtype=np.uint32)
        xh[:, nz:, :] = 0
        x = jnp.asarray(xh)
        g = jax.jit(lambda a, tb: p3.ntt_pallas3(
            a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32))
        s_full, _ = _steady(g, x, tabs)
        # pruned kernel runs log2(n) - skip butterfly stages + 1 twiddle
        # mul per element; 3 HBM passes total (A read+write, B read+write
        # over n/2^skip then full n... honest: A moves n/4-sized input,
        # writes full; B moves full twice)
        stages = (n.bit_length() - 1) - skip + 1
        ops_per = 15 * L * L + 40 * L
        elems = batch * n
        cost_full = KernelCost(
            f"v3b_n{n}", elems * stages * ops_per,
            elems * L * 4 * (0.25 + 1 + 2))
        emit({"item": "roofline_r5", **cost_full.report(s_full),
              "kernel": f"v3b_full_n{n}_b{batch}"})

        # kernel A alone (take-outside form, random input at its layout)
        xm = jnp.asarray(rng.integers(
            0, 1 << 16, (batch, L, n2, n1), dtype=np.uint32))
        w_a, lo_a, tw = tabs[0], tabs[1], tabs[2]
        call_a = p3._call_a(spec, n1, n2, batch, t["halves_a"],
                            t["w_a"].shape[0], t["nf_a"])
        ga = jax.jit(lambda v, w, lo, twd: call_a(
            v, w, lo, twd).sum(dtype=jnp.uint32))
        s_a, _ = _steady(ga, xm, w_a, lo_a, tw)
        stages_a = len(t["halves_a"]) + 1            # butterflies + twiddle
        cost_a = KernelCost(f"v3b_A_n{n}", elems * stages_a * ops_per,
                            elems * L * 4 * 2)
        emit({"item": "roofline_r5", **cost_a.report(s_a),
              "kernel": f"v3b_kernelA_n{n}_b{batch}"})

        # kernel B alone
        w_b, lo_b = tabs[3], tabs[4]
        call_b = p3._call_b(spec, n1, n2, batch, t["halves_b"],
                            t["w_b"].shape[0], t["nf_b"])
        gb = jax.jit(lambda v, w, lo: call_b(v, w, lo).sum(dtype=jnp.uint32))
        s_b, _ = _steady(gb, xm, w_b, lo_b)
        stages_b = len(t["halves_b"])
        cost_b = KernelCost(f"v3b_B_n{n}", elems * stages_b * ops_per,
                            elems * L * 4 * 2)
        emit({"item": "roofline_r5", **cost_b.report(s_b),
              "kernel": f"v3b_kernelB_n{n}_b{batch}"})

    # --- natural collapse kernel
    from lcpc_proof_of_storage_tpu.ops.collapse_pallas import collapse_tensors
    for label, rows, npr in (("ligero20", 128, 8192),
                             ("brakedown25", 143, 235172)):
        c16 = rng.integers(0, 1 << 16, (rows, npr, L)).astype(np.uint16)
        c16[..., -1] = 0
        t16 = rng.integers(0, 1 << 16, (2, rows, L)).astype(np.uint32)
        t16[..., -1] = 0
        cm, tm = jnp.asarray(c16), jnp.asarray(t16)
        g = jax.jit(lambda c, tt: collapse_tensors(
            c, tt, spec).sum(dtype=jnp.uint32))
        s, _ = _steady(g, cm, tm)
        # 2 t-rows x rows x npr limb-pair products: 2*L^2 mul+add each;
        # traffic = uint16 coeff read + uint32 out write
        cost = KernelCost(
            f"collapse_{label}", 2 * rows * npr * (2 * L * L + 6 * L),
            rows * npr * L * 2 + 2 * npr * L * 4)
        emit({"item": "roofline_r5", **cost.report(s),
              "kernel": f"collapse_{label}"})
        del cm

    # --- one-pass expander encode (brakedown 2^21 row shape)
    from lcpc_proof_of_storage_tpu.codes.brakedown import BrakedownEncoding
    enc = BrakedownEncoding.new(1 << 21, 0, spec)
    n_rows, n_per_row, n_cols = enc.get_dims(1 << 21)
    xh = rng.integers(0, 1 << 16, (n_rows, n_per_row, L), dtype=np.uint32)
    xh[..., -1] = 0
    x = jnp.asarray(xh)
    ee = enc._enc
    ops_dev = ee.device_operands() if hasattr(ee, "device_operands") else None
    g = jax.jit(lambda v: ee.encode(v, ops_dev).sum(dtype=jnp.uint32))
    s, _ = _steady(g, x)
    nnz = sum(int(m.idx.size) for m in (ee.precodes + ee.postcodes))
    vand = int(np.prod(ee.vander.shape)) if hasattr(ee, "vander") else 0
    int_ops = n_rows * (nnz + vand) * (2 * L * L + 6 * L)
    bytes_moved = n_rows * (n_per_row + n_cols) * L * 4 \
        + n_rows * nnz * L * 4
    cost = KernelCost("expander21", int_ops, bytes_moved)
    emit({"item": "roofline_r5", **cost.report(s),
          "kernel": f"expander_b21_rows{n_rows}", "nnz_per_row": nnz})

    # --- blake3 column hash at the 2^20 encoded shape
    from lcpc_proof_of_storage_tpu.ops.blake3_jax import hash_columns
    rows_h, cols_h = 128, 1 << 15
    xh = rng.integers(0, 1 << 16, (rows_h, cols_h, L), dtype=np.uint32)
    xh[..., -1] = 0
    x = jnp.asarray(xh)
    g = jax.jit(lambda v: hash_columns(v, spec).sum(dtype=jnp.uint32))
    s, _ = _steady(g, x)
    emit({"item": "roofline_r5",
          **hash_columns_cost(rows_h, cols_h, spec.repr_bytes).report(s),
          "kernel": f"blake3_hash_{rows_h}x{cols_h}"})


@item("collapse_mxu")
def _collapse_mxu():
    """int8 MXU matmul collapse (ops/collapse_mxu.py): bit-equality vs
    the XLA limb-dot oracle on hardware, then timing vs the natural VPU
    kernel at the protocol-critical shapes.  The natural kernel measured
    ~5% of compute SoL (r5 roofline) — the MXU path's model is ~10x."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.fields.limb import limb_field
    from lcpc_proof_of_storage_tpu.ops.collapse_mxu import collapse_tensors_mxu
    from lcpc_proof_of_storage_tpu.ops.collapse_pallas import (
        collapse_tensors_natural)

    spec = FIELDS["ft255"]
    lf = limb_field(spec)
    # correctness first (vs XLA oracle, incl. a >1024-row chunked shape)
    for rows, npr in ((128, 8192), (2050, 1024)):
        rng = np.random.default_rng(rows)
        c16 = rng.integers(0, 1 << 16, (rows, npr, spec.num_limbs16)).astype(
            np.uint16)
        c16[..., -1] = 0
        t16 = rng.integers(0, 1 << 16, (2, rows, spec.num_limbs16)).astype(
            np.uint32)
        t16[..., -1] = 0
        cm, tm = jnp.asarray(c16), jnp.asarray(t16)
        got = np.asarray(jax.jit(
            lambda c, t: collapse_tensors_mxu(c, t, spec))(cm, tm))

        def _ref(c, t):
            acc = None
            for r0 in range(0, c.shape[0], 16):
                part = lf.dot(c[r0:r0 + 16].astype(jnp.uint32)[None],
                              t[:, r0:r0 + 16, None, :], axis=1)
                acc = part if acc is None else lf.add(acc, part)
            return acc

        ref = np.asarray(jax.jit(_ref)(cm, tm))
        ok = bool(np.array_equal(got, ref))
        emit({"item": "collapse_mxu", "what": "validate",
              "dims": [rows, npr], "ok": ok})
        if not ok:
            raise SystemExit(f"MISMATCH mxu collapse {rows}x{npr}")
    # timing vs natural at the three protocol shapes
    for label, rows, npr in (("ligero20", 128, 8192),
                             ("brakedown25", 143, 235172),
                             ("ligero25", 724, 46341)):
        rng = np.random.default_rng(rows)
        c16 = rng.integers(0, 1 << 16, (rows, npr, spec.num_limbs16)).astype(
            np.uint16)
        c16[..., -1] = 0
        t16 = rng.integers(0, 1 << 16, (2, rows, spec.num_limbs16)).astype(
            np.uint32)
        t16[..., -1] = 0
        cm = jax.block_until_ready(jnp.asarray(c16))
        tm = jnp.asarray(t16)
        g_m = jax.jit(lambda c, t: collapse_tensors_mxu(
            c, t, spec).sum(dtype=jnp.uint32))
        s_m, c_m = _steady(g_m, cm, tm)
        g_n = jax.jit(lambda c, t: collapse_tensors_natural(
            c, t, spec).sum(dtype=jnp.uint32))
        s_n, _ = _steady(g_n, cm, tm)
        emit({"item": "collapse_mxu", "shape": label, "dims": [rows, npr],
              "mxu_s": round(s_m, 4), "natural_s": round(s_n, 4),
              "mxu_compile_s": round(c_m, 1),
              "speedup": round(s_n / s_m, 3)})
        del cm
        import gc
        gc.collect()


@item("proto_mxu")
def _proto_mxu():
    """Protocol latencies with the MXU collapse enabled (run after
    collapse_mxu validates; compare against proto_r5/proto_r5_25)."""
    from bench_protocol import run_protocol
    os.environ["LCPC_COLLAPSE_KERNEL"] = "mxu"
    try:
        for r in run_protocol(log2s=[20], code="ligero", iters=3):
            emit({"item": "proto_mxu", **r})
        os.environ["LCPC_STREAM_INFLIGHT"] = "1"
        os.environ["LCPC_PROTO_KEEP_COMM"] = "device"
        for r in run_protocol(log2s=[25], code="ligero", iters=3):
            emit({"item": "proto_mxu", **r})
        os.environ["LCPC_PROTO_STREAM_BYTES"] = "2e9"
        for r in run_protocol(log2s=[25], code="brakedown", iters=3):
            emit({"item": "proto_mxu", **r})
    finally:
        for k in ("LCPC_COLLAPSE_KERNEL", "LCPC_STREAM_INFLIGHT",
                  "LCPC_PROTO_KEEP_COMM", "LCPC_PROTO_STREAM_BYTES"):
            os.environ.pop(k, None)


@item("proto_final")
def _proto_final():
    """Protocol latencies with the full r5 stack (natural collapse +
    lazy packed paths): ligero 2^20/2^21, brakedown 2^21."""
    from bench_protocol import run_protocol
    for r in run_protocol(log2s=[20, 21], code="ligero", iters=3):
        emit({"item": "proto_final", **r})
    for r in run_protocol(log2s=[21], code="brakedown", iters=3):
        emit({"item": "proto_final", **r})


@item("proto_final25")
def _proto_final25():
    """2^25 device-resident protocol latencies, full r5 stack."""
    from bench_protocol import run_protocol
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    os.environ["LCPC_PROTO_KEEP_COMM"] = "device"
    try:
        for r in run_protocol(log2s=[25], code="ligero", iters=3):
            emit({"item": "proto_final25", **r})
        os.environ["LCPC_PROTO_STREAM_BYTES"] = "2e9"
        for r in run_protocol(log2s=[25], code="brakedown", iters=3):
            emit({"item": "proto_final25", **r})
    finally:
        for k in ("LCPC_STREAM_INFLIGHT", "LCPC_PROTO_KEEP_COMM",
                  "LCPC_PROTO_STREAM_BYTES"):
            os.environ.pop(k, None)


@item("proto_profile_final")
def _proto_profile_final():
    """Phase decompositions with the full r5 stack."""
    from profile_protocol import run_profile
    emit({"item": "proto_profile_final", **run_profile(20, "ligero")})
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "proto_profile_final",
              **run_profile(25, "brakedown", keep_comm="device")})
    finally:
        os.environ.pop("LCPC_STREAM_INFLIGHT", None)


@item("ntt19_split")
def _ntt19_split():
    """The 2^27 commit (n_cols = 2^19) sits 4% behind the reference; its
    NTT runs in the extended window (n1=2048, n2=256).  Probe the
    alternate (n1=1024, n2=512) factorization + kernel A/B splits at the
    realistic stream-batch shape (b=64) to locate the residual."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FT255
    from lcpc_proof_of_storage_tpu.ops import ntt_pallas3 as p3

    spec = FT255
    L = spec.num_limbs16
    n, b = 1 << 19, 64
    nz = n >> 2
    rng = np.random.default_rng(1)
    xh = rng.integers(0, 1 << 16, (b, n, L), dtype=np.uint32)
    xh[:, nz:, :] = 0
    x = jnp.asarray(xh)

    def clear():
        for f in (p3._v3_tables_np, p3.v3_device_tables, p3._call_a,
                  p3._call_b):
            getattr(f, "cache_clear", lambda: None)()

    for n1xl, n2xl, label in ((2048, 512, "default_2048x256"),
                              (1024, 512, "alt_1024x512")):
        p3._N1MAX_XL, p3._N2MAX_XL = n1xl, n2xl
        clear()
        t = p3._v3_tables_np(spec, n, nz)
        tabs = p3.v3_device_tables(spec, n, n_nonzero=nz)
        g = jax.jit(lambda a, tb: p3.ntt_pallas3(
            a, spec, n_nonzero=nz, tables=tb).sum(dtype=jnp.uint32))
        try:
            s, c = _steady(g, x, tabs)
            emit({"item": "ntt19_split", "label": label,
                  "n1": t["n1"], "n2": t["n2"],
                  "v3b_s": round(s, 4), "compile_s": round(c, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"item": "ntt19_split", "label": label,
                  "error": f"{type(e).__name__}: {e}"})
    p3._N1MAX_XL, p3._N2MAX_XL = 2048, 512
    clear()
    # kernel A/B alone at the default split, for the roofline table
    t = p3._v3_tables_np(spec, n, nz)
    n1, n2 = t["n1"], t["n2"]
    tabs = p3.v3_device_tables(spec, n, n_nonzero=nz)
    xm = jnp.asarray(rng.integers(0, 1 << 16, (b, L, n2, n1),
                                  dtype=np.uint32))
    call_a = p3._call_a(spec, n1, n2, b, t["halves_a"], t["w_a"].shape[0],
                        t["nf_a"])
    ga = jax.jit(lambda v, w, lo, twd: call_a(
        v, w, lo, twd).sum(dtype=jnp.uint32))
    s_a, _ = _steady(ga, xm, tabs[0], tabs[1], tabs[2])
    call_b = p3._call_b(spec, n1, n2, b, t["halves_b"], t["w_b"].shape[0],
                        t["nf_b"])
    gb = jax.jit(lambda v, w, lo: call_b(v, w, lo).sum(dtype=jnp.uint32))
    s_b, _ = _steady(gb, xm, tabs[3], tabs[4])
    emit({"item": "ntt19_split", "label": "kernels_default",
          "n1": n1, "n2": n2,
          "kernelA_s": round(s_a, 4), "kernelB_s": round(s_b, 4)})


@item("bench29_synth_cached")
def _bench29_synth_cached():
    """2^29 synthetic retry with the take-OUTSIDE kernel A variant
    (NZMAX=64 < nz_rows=256): that kernel is in the persistent compile
    cache from the r4 2^29 attempts, sidestepping the first-time remote
    compile that ate the pass-2 synthetic run."""
    os.environ["LCPC_PALLAS3_INKERNEL_NZMAX"] = "64"
    os.environ["LCPC_BENCH_SYNTH"] = "1"
    os.environ["LCPC_STREAM_INFLIGHT"] = "1"
    try:
        emit({"item": "bench29_synth_cached",
              **r4._bench_with_kernel(29, 1, "v3")})
    finally:
        for k in ("LCPC_PALLAS3_INKERNEL_NZMAX", "LCPC_BENCH_SYNTH",
                  "LCPC_STREAM_INFLIGHT"):
            os.environ.pop(k, None)


R5C = [
    "r5_validate", "proto_final", "bench29_synth_cached", "proto_final25",
    "ntt19_split", "proto_profile_final",
]


@item("bench29_host_r5")
def _bench29_host_r5():
    """The honest host-coeff 2^29 row, now with the 256 MB chunked upload
    watchdog (stalled RPC -> loud retry instead of a 90-min hang).  Ref
    94.6 s; this is upload-wall bound (~17 GB / ~35 MB/s ~ 8+ min/iter
    best case).  LAST item: a tunnel stall here must not cost others."""
    emit({"item": "bench29_host_r5", **r4._bench_with_kernel(29, 1, "v3")})


R5 = [
    "r5_validate", "proto_r5", "proto_r5_25", "proto_profile_r5",
    "bench20_r5", "collapse_nat_micro", "roofline_r5", "blake2b_micro",
    "bench27_r5", "bench27_synth", "bench29_synth", "bench29_host_r5",
]

R5B = [
    "r5_validate", "collapse_mxu", "proto_r5_25", "proto_mxu",
    "roofline_r5", "bench27_r5", "bench27_synth", "bench29_synth",
    "bench29_host_r5",
]


if __name__ == "__main__":
    names = sys.argv[1:] or R5
    if names == ["r5"]:
        names = R5
    elif names == ["r5b"]:
        names = R5B
    elif names == ["r5c"]:
        names = R5C
    sys.argv = [sys.argv[0]] + names
    r4.RESULTS = os.environ["LCPC_CAMPAIGN_OUT"]
    r4.main()
