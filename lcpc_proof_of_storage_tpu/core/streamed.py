"""Out-of-core commit: encode + hash in row batches so the encoded matrix
never materializes on device.

At 2^26 ft255 the encoded matrix is (1024, 262144, 16) uint32 = 17 GB —
past one chip's HBM — but the COEFFICIENT matrix is only 4.3 GB.  Commit
needs the encoded matrix only to (a) hash its columns and (b) serve opened
columns to prove().  So: keep coefficients device-resident, encode row
batches through the same fused NTT pipeline, absorb each batch into
per-column incremental Blake3 chunk CVs (ops/blake3_jax.chunk_cvs_words),
and optionally stream the encoded batches to host RAM for later proving.

This covers the reference's large-n commits (doc/benchmark-results/
20210807_64c_255bit_ligero_dfl.txt:20-24 goes to 2^29 on a 256 GB host) on
a single 16 GB chip, and is the device-side analogue of the PoS streaming
writer (pos/storage.py EncodedFileWriter).

Bit-compat: column hash = blake3(32 zero bytes || column reprs) with the
chunk tree of the whole message — chunk CVs computed per batch are CVs of
the same chunks the one-shot hash would compute (batch boundaries align to
chunk boundaries), so roots are bit-identical to commit() (tests/
test_streamed_commit.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..fields.field import FieldSpec, ints_to_limbs, limbs_to_ints
from ..fields.limb import limb_field
from ..ops.blake3_jax import (
    chunk_cvs_words, limbs_to_repr_words, merge_chunk_cvs,
)
from .commit import LcCommit, _coeffs_to_matrix, _enc_jit, merkle_tree_device
from .encoding import LcEncoding


def _row_batches(n_rows: int, repr_bytes: int, target_rows: int) -> list[tuple[int, int]]:
    """Split rows into batches whose byte spans (incl. the 32-byte zero
    prefix before row 0) end on Blake3 chunk boundaries — except the final
    batch, which may end mid-chunk (partial last chunk)."""
    W = repr_bytes
    step = 1024 // int(np.gcd(1024, W))          # rows per whole-chunk stride
    r0 = next(r for r in range(1, step + 1) if (32 + r * W) % 1024 == 0)
    bounds = [0]
    pos = min(r0 + ((max(target_rows - r0, 0)) // step) * step, n_rows)
    if pos <= 0:
        pos = min(r0, n_rows)
    while pos < n_rows:
        bounds.append(pos)
        pos = min(pos + max(step, (target_rows // step) * step), n_rows)
    bounds.append(n_rows)
    return list(zip(bounds[:-1], bounds[1:]))


class SyntheticCoeffs:
    """BENCH-ONLY coefficient source: each row batch is generated ON DEVICE
    from (seed, chunk counter) inside the batch program — no coefficient
    matrix exists on host or device, so the commit measures the pure
    compute envelope at sizes where even uint16 coefficients exceed HBM
    and the host upload is the tunnel wall (Ligero 2^29 = 17 GB, r4
    VERDICT missing #1).  Values are uniform 16-bit limbs with the top
    limb masked below p's leading limb (same construction as bench.py's
    host generator) — valid canonical field elements, but NOT the same
    data a host-seeded run would produce; roots are reproducible per
    (seed, shape) only.  The returned commit carries coeffs=None and
    serves the root alone."""

    def __init__(self, length: int, seed: int = 0):
        self.length = length
        self.seed = seed


def _device_put_watchdog(arr: np.ndarray):
    """Upload a host row-batch in bounded chunks, each under a watchdog:
    a stalled tunnel RPC times out and is retried once with a fresh
    buffer instead of hanging forever (r4 lost three 90-minute campaign
    slots to single stalled RPCs inside a 17 GB upload).  Each chunk is
    forced to completion with a 1-element readback (block_until_ready is
    async on axon).  Returns the device array (concatenated on device).

    LCPC_UPLOAD_CHUNK_BYTES (default 256 MB) bounds the per-RPC exposure;
    LCPC_UPLOAD_TIMEOUT_S (default chunk/3 MB/s) the stall timeout;
    LCPC_UPLOAD_WATCHDOG=0 disables (plain implicit transfer)."""
    import os
    import threading
    chunk = float(os.environ.get("LCPC_UPLOAD_CHUNK_BYTES", str(256 << 20)))
    row_bytes = max(arr.nbytes // max(arr.shape[0], 1), 1)
    rows_per = max(1, int(chunk // row_bytes))
    timeout = float(os.environ.get(
        "LCPC_UPLOAD_TIMEOUT_S", str(max(60.0, rows_per * row_bytes / 3e6))))
    parts = []
    for s in range(0, arr.shape[0], rows_per):
        piece = arr[s : s + rows_per]
        for attempt in range(2):
            result: dict = {}

            def put():
                try:
                    d = jax.device_put(piece)
                    _ = int(np.asarray(jax.device_get(
                        d.reshape(-1)[0])))       # force the transfer
                    result["d"] = d
                except BaseException as e:        # noqa: BLE001
                    result["e"] = e

            th = threading.Thread(target=put, daemon=True)
            th.start()
            th.join(timeout)
            if "d" in result:
                parts.append(result["d"])
                break
            if "e" in result:
                raise result["e"]
            if attempt == 0:
                print(f"# upload chunk rows[{s}:{s + len(piece)}] stalled "
                      f"after {timeout:.0f}s; retrying once", flush=True)
            else:
                raise RuntimeError(
                    f"host->device upload stalled twice at rows "
                    f"[{s}:{s + len(piece)}] ({timeout:.0f}s timeout)")
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def commit_streamed(coeffs, enc: LcEncoding, target_batch_rows: int | None = None,
                    keep_comm: bool | str = True,
                    device_coeffs: bool = True) -> LcCommit:
    """commit() with row-batched encode + incremental column hashing.

    keep_comm=True streams encoded batches back to host RAM (np.ndarray
    comm — prove() accepts it); False discards them (root/verify only;
    re-encode on demand to prove); "device" keeps the encoded matrix
    DEVICE-resident as uint16 (limbs are 16-bit, so half the HBM of the
    one-shot pipeline's uint32 — 1.7 GB for Brakedown 2^25 ft255) so
    prove() serves columns+paths in one fused gather instead of paying a
    re-encode (the round-3 2^25 prove was ~2 commit-equivalents).
    target_batch_rows=None sizes batches so
    one encoded batch is ~LCPC_STREAM_BATCH_BYTES (default 1 GB) — the NTT
    chain holds 2-4 batch-sized buffers live, and the coefficient matrix
    stays resident, so bigger batches OOM before they help.

    device_coeffs=False keeps the coefficient matrix in HOST RAM and uploads
    one row batch per step (uint16 over the wire — limbs are 16-bit): the
    2^27+ regime, where even the coefficients exceed a single chip's HBM
    alongside the encode transients.  Pass coeffs as an (n, L) uint32 limb
    array to avoid a python-int conversion at this scale."""
    assert getattr(enc, "mesh", None) is None, (
        "wide (mesh) encodings commit via parallel.wide.wide_commit_from_"
        "matrix — the cross-chip NTT cannot nest inside the streamed batch "
        "jit (its twiddles would bake into the HLO as literals)")
    synthetic = isinstance(coeffs, SyntheticCoeffs)
    if synthetic:
        n_rows, n_per_row, n_cols = enc.get_dims(coeffs.length)
        coeff_mat = None
    elif not device_coeffs:
        if isinstance(coeffs, np.ndarray) and coeffs.ndim == 2:
            length = coeffs.shape[0]
            arr16 = coeffs.astype(np.uint16)
        else:
            from ..fields.field import ints_to_limbs
            length = len(coeffs)
            arr16 = ints_to_limbs(list(coeffs), enc.spec).astype(np.uint16)
        n_rows, n_per_row, n_cols = enc.get_dims(length)
        L = arr16.shape[1]
        pad = n_rows * n_per_row - length
        if pad:
            arr16 = np.concatenate([arr16, np.zeros((pad, L), np.uint16)])
        coeff_mat = arr16.reshape(n_rows, n_per_row, L)      # host, uint16
    else:
        coeff_mat, (n_rows, n_per_row, n_cols) = _coeffs_to_matrix(coeffs, enc)
    spec = enc.spec
    W = spec.repr_bytes
    msg_len = 32 + n_rows * W
    total_chunks = (msg_len + 1023) // 1024
    if total_chunks < 2:
        # single-chunk columns: nothing to stream (tiny matrix) — one-shot
        assert not synthetic, "SyntheticCoeffs is for streamed sizes only"
        from .commit import commit
        c = commit(coeffs, enc)
        if keep_comm == "device":
            pass                       # one-shot comm is already on device
        elif keep_comm:
            c.comm = np.asarray(c.comm)
        else:
            c.comm = None
        return c

    if target_batch_rows is None:
        import os
        budget = int(os.environ.get("LCPC_STREAM_BATCH_BYTES", str(1 << 30)))
        row_bytes = n_cols * spec.num_limbs16 * 4
        target_batch_rows = max(1, min(1024, budget // row_bytes))
    batches = _row_batches(n_rows, W, target_batch_rows)
    ops = enc.device_operands()

    def make_batch_fn(rows_b: int, first: bool, k: int, tail_len: int,
                      comm_mode: str, gen_seed: int | None = None):
        nwords_pad = k * 256 - ((32 if first else 0) + rows_b * W) // 4
        L16 = spec.num_limbs16
        if gen_seed is not None:
            # SyntheticCoeffs: top limb masked below p's leading limb so
            # every value is canonical (< p); batch identity folds in via
            # the first chunk counter (traced — interior batches share one
            # compilation)
            top = (spec.modulus >> (16 * (L16 - 1))) - 1 if L16 > 1 \
                else spec.modulus - 1
            top = max(int(top), 1)

        def f(cm_rows, counters, operands):
            if gen_seed is not None:
                key = jax.random.fold_in(jax.random.PRNGKey(gen_seed),
                                         counters[0])
                cm_rows = jax.random.bits(
                    key, (rows_b, n_per_row, L16), jnp.uint32) & 0xFFFF
                cm_rows = cm_rows.at[..., L16 - 1].set(
                    cm_rows[..., L16 - 1] & top)
            cm_rows = cm_rows.astype(jnp.uint32)    # host mode ships uint16
            padded = jnp.zeros((rows_b, n_cols, cm_rows.shape[-1]), jnp.uint32)
            padded = padded.at[:, :n_per_row, :].set(cm_rows)
            comm_b = enc.encode(padded, operands)
            words = limbs_to_repr_words(comm_b, spec)        # (rb, nc, W/4)
            words = jnp.transpose(words, (1, 0, 2)).reshape(n_cols, -1)
            if first:
                words = jnp.concatenate(
                    [jnp.zeros((n_cols, 8), jnp.uint32), words], axis=1)
            if nwords_pad:
                words = jnp.pad(words, ((0, 0), (0, nwords_pad)))
            cvs = chunk_cvs_words(words, counters, tail_len)
            # comm_mode "none": comm_b stays an internal temp (a live output
            # buffer per enqueued batch would accumulate in HBM — async
            # dispatch runs well ahead of execution).  "device": keep it,
            # narrowed to uint16 (limbs are 16-bit).
            if comm_mode == "host":
                return comm_b, cvs
            if comm_mode == "device":
                return comm_b.astype(jnp.uint16), cvs
            return cvs
        return f

    # In-flight window: how many batches may be enqueued beyond the one
    # being synced.  0 = strict per-batch sync (round-2 behavior; the NTT
    # transients of unbounded in-flight batches OOM HBM).  Default 1: one
    # extra batch of transients overlaps dispatch/upload with the current
    # batch's encode — measured faster for both host-coeff uploads and
    # device-resident streams (r4: 2^25 3.63 s, 2^26 7.16 s vs 5.09/9.37
    # without).  Set LCPC_STREAM_INFLIGHT=0 if a huge-n run OOMs HBM.
    import os as _os
    inflight = int(_os.environ.get("LCPC_STREAM_INFLIGHT", "1"))

    comm_mode = ("device" if keep_comm == "device"
                 else "host" if keep_comm else "none")
    cv_parts = []
    comm_parts = [] if keep_comm else None
    pending: list = []

    def _drain_one():
        h = pending.pop(0)
        if comm_mode == "host":
            comm_parts.append(np.asarray(h))
        else:
            # scalar readback bounds enqueued-but-unexecuted batches
            _ = int(np.asarray(jax.device_get(h[0, 0, 0])))

    chunk0 = 0
    for r_start, r_end in batches:
        rows_b = r_end - r_start
        first = r_start == 0
        span = (32 if first else 0) + rows_b * W
        k = (span + 1023) // 1024                   # chunks this batch covers
        last = r_end == n_rows
        tail_len = (1024 if not last or span % 1024 == 0 else span % 1024)
        assert span % 1024 == 0 or last, "interior batch misaligned"
        # jit key excludes chunk0: interior batches share one compilation
        # (counters ride as a traced argument)
        syn = f"_syn{coeffs.seed}" if synthetic else ""
        fn = _enc_jit(
            enc,
            f"streamed_batch_{rows_b}_{first}_{tail_len}_{comm_mode}{syn}",
            lambda: make_batch_fn(rows_b, first, k, tail_len, comm_mode,
                                  gen_seed=coeffs.seed if synthetic else None))
        counters = jnp.arange(chunk0, chunk0 + k, dtype=jnp.uint32)
        if synthetic:
            batch_rows = jnp.zeros((1,), jnp.uint16)
        elif (isinstance(coeff_mat, np.ndarray)
              and _os.environ.get("LCPC_UPLOAD_WATCHDOG", "1") != "0"):
            # host-coeff mode: explicit chunked upload w/ stall retry
            batch_rows = _device_put_watchdog(coeff_mat[r_start:r_end])
        else:
            batch_rows = coeff_mat[r_start:r_end]
        if comm_mode == "host":
            comm_b, cvs = fn(batch_rows, counters, ops)
            try:
                comm_b.copy_to_host_async()
            except AttributeError:
                pass
            pending.append(comm_b)
        elif comm_mode == "device":
            comm_b, cvs = fn(batch_rows, counters, ops)
            comm_parts.append(comm_b)
            pending.append(cvs)
        else:
            cvs = fn(batch_rows, counters, ops)
            pending.append(cvs)
        while len(pending) > inflight:
            _drain_one()
        cv_parts.append(cvs)
        chunk0 += k
    while pending:
        _drain_one()
    assert chunk0 == total_chunks

    finish = _enc_jit(enc, f"streamed_finish_{total_chunks}", lambda: (
        lambda parts: merkle_tree_device(
            merge_chunk_cvs(jnp.concatenate(parts, axis=1)), n_cols)))
    hashes_dev = finish(cv_parts)

    if comm_mode == "host":
        comm = np.concatenate(comm_parts, axis=0)
    elif comm_mode == "device":
        comm = (comm_parts[0] if len(comm_parts) == 1
                else jnp.concatenate(comm_parts, axis=0))
    else:
        comm = None
    return LcCommit(coeffs=coeff_mat, comm=comm, n_rows=n_rows,
                    n_cols=n_cols, n_per_row=n_per_row, hashes_dev=hashes_dev)


# --------------------------------------------------------------------------
# out-of-core prove support: re-encode-on-demand column opening + batched
# collapse.  Matches the reference's large-n prove capability
# (lcpc-2d/src/lib.rs:1034-1123 at 2^25-2^29, where it holds `comm` in
# 256 GB host RAM) without ever materializing the encoded matrix: the
# column challenge indices are known after the transcript squeeze, so one
# batched encode pass gathers exactly the k opened columns.
# --------------------------------------------------------------------------

def _even_row_batches(n_rows: int, bytes_per_row: int,
                      target_batch_rows: int | None) -> list[tuple[int, int]]:
    """Plain even splits (no chunk alignment — nothing is hashed here)."""
    if target_batch_rows is None:
        import os
        budget = int(os.environ.get("LCPC_STREAM_BATCH_BYTES", str(1 << 30)))
        target_batch_rows = max(1, budget // max(bytes_per_row, 1))
    step = max(1, min(n_rows, target_batch_rows))
    return [(s, min(s + step, n_rows)) for s in range(0, n_rows, step)]


def collapse_streamed(
        comm: LcCommit, enc: LcEncoding, tensors: list[list[int]],
        target_batch_rows: int | None = None,
) -> list[tuple[list[int], np.ndarray]]:
    """[(t^T . coeffs as python ints, as (n_per_row, L) limbs) for t in
    tensors], computed in row batches (one pass, shared).

    Per batch: exact-limb dot partials (canonical after lf.dot) are folded
    into a (T, n_per_row, L) device accumulator with a field add — no
    full-matrix (rows, n_per_row, 2L) product transient, so prove works at
    2^26+ where the one-shot collapse's widened product would not fit HBM.
    Host uint16 coefficient matrices (device_coeffs=False commits) upload
    one batch per step."""
    spec = enc.spec
    lf = limb_field(spec)
    n_rows, n_per_row = comm.n_rows, comm.n_per_row
    T = len(tensors)
    t_mat = np.stack([ints_to_limbs(t, spec) for t in tensors])  # (T, rows, L)
    # transient ~ T * rows_b * n_per_row * (2L+1) u32; budget it like a batch
    batches = _even_row_batches(n_rows, T * n_per_row * (2 * lf.L + 1) * 4,
                                target_batch_rows)

    from ..ops.collapse_pallas import collapse_tensors, use_collapse_kernel
    kernel = use_collapse_kernel(spec)

    def make_step(rows_b: int):
        def f(acc, c_rows, t_rows):
            c_rows = c_rows.astype(jnp.uint32)
            if kernel:
                part = collapse_tensors(c_rows, t_rows, spec)
            else:
                part = lf.dot(c_rows[None], t_rows[:, :, None, :], axis=1)
            return lf.add(acc, part)                 # (T, n_per_row, L)
        return f

    acc = lf.zeros((T, n_per_row))
    for r0, r1 in batches:
        step = _enc_jit(enc, f"collapse_stream_{T}_{r1 - r0}",
                        lambda: make_step(r1 - r0))
        acc = step(acc, comm.coeffs[r0:r1], jnp.asarray(t_mat[:, r0:r1]))
    out = np.asarray(acc)
    return [(limbs_to_ints(out[i]), out[i]) for i in range(T)]


def open_columns_streamed(comm: LcCommit, enc: LcEncoding,
                          cols_to_open: list[int],
                          target_batch_rows: int | None = None) -> np.ndarray:
    """(n_rows, k, L) uint32 of the opened columns, re-encoded in batches.

    Each batch runs the same fused encode the commit used, gathers the k
    challenged columns on device, and reads back only (rows_b, k, L) —
    uint16 over the wire (limbs are 16-bit)."""
    spec = enc.spec
    lf = limb_field(spec)
    n_rows, n_per_row, n_cols = comm.n_rows, comm.n_per_row, comm.n_cols
    ops = enc.device_operands()
    idx = jnp.asarray(cols_to_open, jnp.int32)
    batches = _even_row_batches(n_rows, n_cols * lf.L * 4, target_batch_rows)

    def make_fn(rows_b: int):
        def f(c_rows, col_idx, operands):
            c_rows = c_rows.astype(jnp.uint32)
            padded = jnp.zeros((rows_b, n_cols, c_rows.shape[-1]), jnp.uint32)
            padded = padded.at[:, :n_per_row, :].set(c_rows)
            e = enc.encode(padded, operands)
            return jnp.take(e, col_idx, axis=1).astype(jnp.uint16)
        return f

    parts = []
    for r0, r1 in batches:
        fn = _enc_jit(enc, f"open_cols_stream_{r1 - r0}",
                      lambda: make_fn(r1 - r0))
        parts.append(np.asarray(fn(comm.coeffs[r0:r1], idx, ops)))
    return np.concatenate(parts, axis=0).astype(np.uint32)
