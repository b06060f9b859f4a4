"""Core 2d linear-code polynomial commitment engine.

TPU-native re-creation of lcpc-2d/src/lib.rs: commit (651-700), merkleize
(720-815), open_column (818-855), prove (1034-1123), verify (862-982),
collapse_columns (1126-1154).  The heavy kernels (row encode, column hash,
Merkle layers, tensor collapse, column dot checks) run batched on device;
protocol logic, the merlin transcript, and ChaCha challenge expansion run on
host, matching the reference's challenge-derivation semantics bit for bit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.chacha import ChaChaRng, UniformUsize
from ..crypto.transcript import Transcript
from ..fields.field import FieldSpec, ints_to_limbs, limbs_to_ints
from ..fields.limb import limb_field
from ..ops.blake3_jax import (
    bytes_to_digest, digest_to_bytes, digests_to_bytes,
    merkle_parents,
)
from ..ops.blake3_pallas import hash_columns_auto as hash_columns
from ..utils.profiling import phase as _phase
from .encoding import LABEL_CO, LABEL_DT, LABEL_PE, LABEL_PR, LcEncoding, \
    ceil_log2, next_power_of_two


class ProverError(Exception):
    pass


class VerifierError(Exception):
    """kind in {NumColOpens, ColumnPath, ColumnEval, ColumnDegree,
    OuterTensor, InnerTensor, EncodingDims} (lcpc-2d error enums)."""

    def __init__(self, kind: str, msg: str = ""):
        self.kind = kind
        super().__init__(f"{kind}: {msg}" if msg else kind)


class LcColumn:
    """One opened column + Merkle path (lcpc-2d/src/lib.rs:424-433).

    The prover stores the column as a (n_rows, L) uint32 limb array and
    converts to python ints only when something (serde, host math) asks —
    at 2^20 a proof opens ~190 columns x 2048 rows, and eagerly building
    400k python ints dominated prove().  Both forms are accepted."""

    __slots__ = ("_col", "_limbs", "_spec", "_path", "_sibs", "_sibi")

    def __init__(self, col: list[int] | None = None, path: list[bytes] = (),
                 col_limbs: np.ndarray | None = None, spec: FieldSpec = None,
                 sibs: np.ndarray | None = None, sib_idx: int = 0):
        assert col is not None or (col_limbs is not None and spec is not None)
        self._col = col
        self._limbs = col_limbs
        self._spec = spec
        if sibs is not None:
            # lazy path: backed by row sib_idx of a (k, depth, 32) packed
            # sibling array (prove's device path gather / serde) — the
            # ~100k per-proof bytes objects materialize only if something
            # actually reads .path (fold/serde use the packed array)
            self._path = None
            self._sibs = sibs
            self._sibi = sib_idx
        else:
            self._path = list(path)
            self._sibs = None
            self._sibi = 0

    @property
    def path(self) -> list[bytes]:
        if self._path is None:
            row = self._sibs[self._sibi]
            self._path = [row[d].tobytes() for d in range(row.shape[0])]
        return self._path

    @path.setter
    def path(self, value):
        self._path = list(value)
        self._sibs = None

    @property
    def col(self) -> list[int]:
        if self._col is None:
            self._col = limbs_to_ints(np.asarray(self._limbs))
        return self._col

    def col_limbs(self, spec: FieldSpec) -> np.ndarray:
        """(n_rows, L) uint32 limbs of the column values.  A materialized
        .col list is authoritative (callers may have mutated it), so it is
        re-converted on every call; the limb fast path only serves proofs
        whose ints were never materialized."""
        if self._col is not None:
            return ints_to_limbs(self._col, spec)
        return self._limbs

    def __len__(self):
        return self._limbs.shape[0] if self._limbs is not None else len(self._col)

    def __eq__(self, other):
        return (isinstance(other, LcColumn) and self.col == other.col
                and self.path == other.path)

    def __repr__(self):
        return f"LcColumn(n_rows={len(self)}, path_len={len(self.path)})"


class _LimbRow(list):
    """list[int] proof row backed by its (n, L) uint32 limb array.

    prove()/serde attach the limbs they already hold so verify() skips the
    per-int re-conversion (~83 ms for a Brakedown 2^25 proof's 470k row
    values).  ANY in-place mutation drops the backing — the ints are always
    authoritative, so tampering a row value behaves exactly as with a plain
    list (regression: test_tampered_proof_rejected)."""

    def __init__(self, ints, limbs=None):
        super().__init__(ints)
        self._limbs = limbs

    def _inv(self):
        self._limbs = None

    def row_limbs(self, spec: FieldSpec) -> np.ndarray:
        if self._limbs is not None and self._limbs.shape == (
                len(self), spec.num_limbs16):
            return np.asarray(self._limbs, np.uint32)
        return ints_to_limbs(list(self), spec)

    def __reduce__(self):
        # deepcopy/pickle keep the backing only when untouched
        return (_LimbRow, (list(self), self._limbs))


for _m in ("__setitem__", "__delitem__", "__iadd__", "__imul__", "append",
           "extend", "insert", "pop", "remove", "clear", "sort", "reverse"):
    def _make(_m=_m):
        base = getattr(list, _m)

        def method(self, *a, **kw):
            self._inv()
            return base(self, *a, **kw)

        method.__name__ = _m
        return method

    setattr(_LimbRow, _m, _make())
del _m, _make


def _row_limbs_of(v, spec: FieldSpec) -> np.ndarray:
    """(n, L) uint32 limbs of a proof row — the attached backing when the
    row is an unmutated _LimbRow, a fresh conversion otherwise."""
    if isinstance(v, _LimbRow):
        return v.row_limbs(spec)
    return ints_to_limbs(v, spec)


@dataclass
class LcEvalProof:
    """Evaluation proof (lcpc-2d/src/lib.rs:516-529)."""
    n_cols: int
    p_eval: list[int]
    p_random_vec: list[list[int]]
    columns: list[LcColumn]

    def get_n_cols(self) -> int:
        return self.n_cols

    def get_n_per_row(self) -> int:
        return len(self.p_eval)

    def verify(self, root: bytes, outer_tensor, inner_tensor, enc, tr):
        return verify(root, outer_tensor, inner_tensor, self, enc, tr)


@dataclass
class LcRoot:
    root: bytes


class LcCommit:
    """Commitment state (lcpc-2d/src/lib.rs:174-191).

    coeffs/comm are device limb arrays shaped (n_rows, n_per_row|n_cols, L);
    hashes is the Merkle array of 2*np2(n_cols)-1 digests as (n, 8) uint32
    words (leaves first, then layers, root last — reference layout).

    The Merkle array may be constructed DEVICE-resident (hashes_dev): the
    full array is 16.8 MB at Brakedown 2^21 and reading it back inside
    commit() cost ~0.5 s through the ~22 MB/s axon tunnel.  get_root()
    reads back only the root row; prove() gathers sibling paths on device;
    the `.hashes` property materializes the full array lazily for the
    consumers that genuinely need it (serde, PoS leaf digests).
    """

    def __init__(self, coeffs, comm, n_rows: int, n_cols: int,
                 n_per_row: int, hashes=None, hashes_dev=None):
        assert hashes is not None or hashes_dev is not None
        self.coeffs = coeffs
        self.comm = comm
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.n_per_row = n_per_row
        # No eager host copy: prove() gathers sibling paths ON DEVICE and
        # get_root() reads one row, so most commitments never materialize
        # the full array host-side — consumers that do (serde, PoS leaf
        # digests) pay one sync copy at first `.hashes` access.
        self._hashes_np = None if hashes is None else np.asarray(hashes)
        self._hashes_dev = hashes_dev

    @property
    def hashes(self) -> np.ndarray:
        if self._hashes_np is None:
            self._hashes_np = np.asarray(self._hashes_dev)
        return self._hashes_np

    @hashes.setter
    def hashes(self, value) -> None:
        self._hashes_np = np.asarray(value)
        self._hashes_dev = None

    @property
    def hashes_len(self) -> int:
        h = self._hashes_np if self._hashes_np is not None else self._hashes_dev
        return h.shape[0]

    def get_root(self) -> LcRoot:
        if self._hashes_np is None:
            return LcRoot(digest_to_bytes(np.asarray(self._hashes_dev[-1])))
        return LcRoot(digest_to_bytes(self._hashes_np[-1]))

    def get_n_per_row(self) -> int:
        return self.n_per_row

    def get_n_cols(self) -> int:
        return self.n_cols

    def get_n_rows(self) -> int:
        return self.n_rows

    def prove(self, outer_tensor, enc, tr):
        return prove(self, outer_tensor, enc, tr)

    @classmethod
    def commit(cls, coeffs, enc):
        return commit(coeffs, enc)


# --------------------------------------------------------------------------
# commit
# --------------------------------------------------------------------------

def _coeffs_to_matrix(coeffs, enc: LcEncoding):
    """Pad a coefficient vector to the (n_rows, n_per_row, L) matrix."""
    lf = limb_field(enc.spec)
    if isinstance(coeffs, (list, tuple)):
        length = len(coeffs)
        arr = lf.array(list(coeffs))
    else:
        # arrays keep their dtype: a uint16 limb matrix stays uint16 on
        # device (half the HBM / transfer; kernels widen per batch)
        length = coeffs.shape[0]
        arr = jnp.asarray(coeffs)
    n_rows, n_per_row, n_cols = enc.get_dims(length)
    assert n_rows * n_per_row >= length
    assert (n_rows - 1) * n_per_row < length
    assert enc.dims_ok(n_per_row, n_cols)
    pad = n_rows * n_per_row - length
    if pad:
        arr = jnp.concatenate(
            [arr, jnp.zeros((pad, arr.shape[-1]) if arr.ndim == 2 else (pad,),
                            arr.dtype)], axis=0)
    return arr.reshape(n_rows, n_per_row, lf.L), (n_rows, n_per_row, n_cols)


def merkle_tree_device(leaves: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Traced Merkle array build from (n_cols, 8) leaf digests.

    Layout (lcpc-2d/src/lib.rs:685-694, 777-815): [leaves (padded with zero
    digests to np2)] ++ [layer 1] ++ ... ++ [root]; total 2*np2 - 1 entries.
    """
    np2 = next_power_of_two(n_cols)
    cur = jnp.zeros((np2, 8), jnp.uint32).at[:n_cols].set(leaves)
    layers = [cur]
    while cur.shape[0] > 1:
        cur = merkle_parents(cur)
        layers.append(cur)
    return jnp.concatenate(layers, axis=0)


def merkle_hashes_from_leaves(leaves: jnp.ndarray, n_cols: int) -> np.ndarray:
    return np.asarray(merkle_tree_device(leaves, n_cols))


def _enc_jit(enc: LcEncoding, name: str, make_fn):
    """Per-encoding jit cache so repeated commits don't retrace."""
    cache = getattr(enc, "_jit_cache", None)
    if cache is None:
        cache = {}
        enc._jit_cache = cache
    if name not in cache:
        cache[name] = jax.jit(make_fn())
    return cache[name]


def _encode_matrix(coeff_mat: jnp.ndarray, enc: LcEncoding, n_cols: int,
                   operands=None):
    n_rows, n_per_row, L = coeff_mat.shape
    # astype: packed uint16 coefficient matrices widen on device (no-op for
    # uint32) — the encode kernels assume uint32 limbs
    padded = jnp.zeros((n_rows, n_cols, L), jnp.uint32).at[:, :n_per_row, :].set(
        coeff_mat.astype(jnp.uint32))
    return enc.encode(padded, operands)


def commit(coeffs, enc: LcEncoding, digest: str = "blake3") -> LcCommit:
    """lcpc-2d/src/lib.rs:651-700.

    `digest` mirrors the reference's digest type parameter
    (LcCommit<D, E>, lib.rs:174-191).  Blake3 (default) runs the fused
    device hash+Merkle pipeline; any other registered digest (e.g.
    "blake2b", as in the reference's committed microbenches) encodes on
    device and hashes on the HOST — see crypto/digest.py."""
    coeff_mat, (n_rows, n_per_row, n_cols) = _coeffs_to_matrix(coeffs, enc)

    if digest != "blake3":
        if enc.mesh is not None:
            raise ProverError("generic digests commit single-chip only")
        from ..crypto.digest import (column_leaves_host, get_digest,
                                     merkle_tree_host)
        d = get_digest(digest)
        encode = _enc_jit(enc, "commit_encode", lambda: (
            lambda cm, ops: _encode_matrix(cm, enc, n_cols, ops)))
        comm_np = np.asarray(encode(coeff_mat, enc.device_operands()))
        leaves = column_leaves_host(comm_np, enc.spec, d)
        hashes = merkle_tree_host(leaves, n_cols, d)
        return LcCommit(coeffs=coeff_mat, comm=comm_np, n_rows=n_rows,
                        n_cols=n_cols, n_per_row=n_per_row, hashes=hashes)

    if enc.mesh is not None:
        # wide-row mode: encoded columns sharded over the mesh, cross-chip
        # NTT encode, shard-local hashing (parallel/wide.py).  The cross-chip
        # ops assume uint32 limbs, so widen packed uint16 inputs here (the
        # single-chip pipeline widens per batch instead).
        from ..parallel.wide import wide_commit_from_matrix
        return wide_commit_from_matrix(coeff_mat.astype(jnp.uint32),
                                       (n_rows, n_per_row, n_cols), enc)

    # encode tables (Brakedown gather matrices) ride as jit arguments, not
    # HLO literals — multi-MB embedded constants blow up compile payloads
    pipeline = _enc_jit(enc, "commit_pipeline", lambda: (
        lambda cm, ops: ((lambda comm: (comm, merkle_tree_device(
                        hash_columns(comm, enc.spec), n_cols)))
                    (_encode_matrix(cm, enc, n_cols, ops)))))
    comm, hashes_dev = pipeline(coeff_mat, enc.device_operands())
    return LcCommit(coeffs=coeff_mat, comm=comm, n_rows=n_rows,
                    n_cols=n_cols, n_per_row=n_per_row, hashes_dev=hashes_dev)


def check_comm(comm: LcCommit, enc: LcEncoding) -> None:
    # comm.comm is None for a commit_streamed(keep_comm=False) commitment:
    # prove() then re-encodes on demand from the resident coefficients
    # (core/streamed.py open_columns_streamed)
    # a wide Brakedown comm is zero-padded past the ragged n_cols to a
    # mesh-shard multiple (ops/expander.py encode_wide); columns at or
    # beyond n_cols are never opened
    ok = ((comm.comm is None
           or (comm.comm.shape[0] == comm.n_rows
               and comm.comm.shape[1] >= comm.n_cols))
          and comm.coeffs.shape[:2] == (comm.n_rows, comm.n_per_row)
          and comm.hashes_len == 2 * next_power_of_two(comm.n_cols) - 1
          and enc.dims_ok(comm.n_per_row, comm.n_cols))
    if not ok:
        raise ProverError("inconsistent commitment fields")


# --------------------------------------------------------------------------
# column opening
# --------------------------------------------------------------------------

def open_column(comm: LcCommit, column: int, spec: FieldSpec | None = None) -> LcColumn:
    """lcpc-2d/src/lib.rs:818-855."""
    if column >= comm.n_cols:
        raise ProverError("bad column number")
    limbs = np.asarray(comm.comm[:, column, :])
    path = merkle_path(comm.hashes, comm.n_cols, column)
    if spec is not None:
        return LcColumn(col_limbs=limbs, spec=spec, path=path)
    return LcColumn(col=limbs_to_ints(limbs), path=path)


def merkle_path(hashes: np.ndarray, n_cols: int, column: int) -> list[bytes]:
    """Sibling digests, leaf level upward (sibling = (col&~1)|(~col&1))."""
    path = []
    offset = 0
    width = next_power_of_two(n_cols)
    col = column
    for _ in range(ceil_log2(n_cols)):
        other = (col & ~1) | (~col & 1)
        path.append(digest_to_bytes(hashes[offset + other]))
        offset += width
        width //= 2
        col >>= 1
    return path


def _path_indices(n_cols: int, columns: list[int]) -> np.ndarray:
    """(k*depth,) flat Merkle-array indices of every column's sibling path
    (row-major per column, leaf level upward)."""
    depth = ceil_log2(n_cols)
    k = len(columns)
    cur = np.asarray(columns, np.int64)
    width = next_power_of_two(n_cols)
    offset = 0
    idxs = np.empty((depth, k), np.int64)
    for lvl in range(depth):
        idxs[lvl] = offset + ((cur & ~1) | (~cur & 1))
        offset += width
        width //= 2
        cur >>= 1
    return idxs.T.reshape(-1)


def _paths_from_sibs(sibs: np.ndarray, k: int, depth: int) -> list[list[bytes]]:
    """(k*depth, 8) uint32 sibling digests -> per-column byte paths in ONE
    tobytes pass."""
    blob = np.ascontiguousarray(sibs.astype("<u4", copy=False)).tobytes()
    return [[blob[(i * depth + l) * 32 : (i * depth + l + 1) * 32]
             for l in range(depth)] for i in range(k)]


def _packed_from_sibs(sibs: np.ndarray, k: int, depth: int) -> np.ndarray:
    """(k*depth, 8) uint32 sibling digests -> (k, depth, 32) uint8 array
    (the fold's sibs_packed fast path)."""
    return np.ascontiguousarray(
        sibs.astype("<u4", copy=False)).view(np.uint8).reshape(k, depth, 32)


def merkle_paths_batch(comm: "LcCommit",
                       columns: list[int]) -> list[list[bytes]]:
    """merkle_path for many columns in one vectorized gather.

    Brakedown opens thousands of columns (6593 at SdigCode3/lambda=128), so
    per-column numpy indexing + digest_to_bytes dominated prove().  When the
    Merkle array is device-resident, the sibling digests are gathered ON
    DEVICE and only (k*depth, 8) words read back (3.8 MB for a Brakedown
    2^21 proof vs 16.8 MB for the full array)."""
    n_cols = comm.n_cols
    depth = ceil_log2(n_cols)
    k = len(columns)
    if depth == 0 or k == 0:
        return [[] for _ in range(k)]
    flat = _path_indices(n_cols, columns)
    if comm._hashes_np is None:
        sibs = np.asarray(jnp.take(comm._hashes_dev,
                                   jnp.asarray(flat, jnp.int32), axis=0))
    else:
        sibs = np.asarray(comm._hashes_np, dtype="<u4")[flat]
    return _paths_from_sibs(sibs, k, depth)


def verify_column_path(column: LcColumn, col_num: int, root: bytes,
                       spec: FieldSpec, digest: str = "blake3") -> bool:
    """lcpc-2d/src/lib.rs:985-1008 (host, per column).  The batch verifier
    hashes all leaves on device instead (_column_checks_fn); this stays as
    the single-column entry point (PoS helpers, tests)."""
    msg = b"\x00" * 32 + b"".join(spec.to_repr(v) for v in column.col)
    if digest != "blake3":
        from ..crypto.digest import get_digest
        d = get_digest(digest)
        return _fold_paths_generic([d.hash(msg)], [col_num],
                                   [column.path], d)[0] == root
    from ..crypto.blake3_ref import blake3
    return _fold_path(blake3(msg), col_num, column.path) == root


# --------------------------------------------------------------------------
# prove
# --------------------------------------------------------------------------

def _challenge_tensor(tr: Transcript, spec: FieldSpec, n: int) -> list[int]:
    """LABEL_DT challenge -> ChaCha20 -> n field elements (ff::random)."""
    key = tr.challenge_bytes(LABEL_DT, 32)
    rng = ChaChaRng(key, 20)
    return spec.random_vec(rng, n)


import functools


@functools.lru_cache(maxsize=None)
def _collapse_fn(spec: FieldSpec):
    lf = limb_field(spec)
    # astype in: a host-mode streamed commit stores coeffs as uint16 (16-bit
    # limbs); widen on device (no-op for uint32 inputs).  astype out: the
    # dot returns canonical 16-bit limbs — ship uint16 (halves the
    # device->host readback; the tunnel reads back at ~22 MB/s)
    return jax.jit(lambda c, tt: lf.dot(
        c.astype(jnp.uint32), tt, axis=0).astype(jnp.uint16))


@functools.lru_cache(maxsize=None)
def _column_checks_fn(spec: FieldSpec):
    """One device program for the verifier's per-column math: the degree-test
    and eval dot products AND the leaf digests H(0 || column) — everything
    that scales with n_col_opens x n_rows runs batched on device, one
    round trip (lcpc-2d/src/lib.rs:953-974, 985-1030).  Used by the wide
    (mesh) verifier; single-chip verify uses the fused program below."""
    lf = limb_field(spec)

    def f(cols, rand, outer):
        d_rand = lf.dot(cols[None, :, :, :], rand[:, None, :, :], axis=2)  # (ndt,k,L)
        d_eval = lf.dot(cols, outer[None, :, :], axis=1)                   # (k,L)
        leaves = hash_columns(jnp.transpose(cols, (1, 0, 2)), spec)        # (k,8)
        return d_rand, d_eval, leaves

    return jax.jit(f)


def _verify_checks_fused(enc: LcEncoding):
    """ONE device program for the whole verifier compute: re-encode the
    degree-test + eval rows, gather the opened column positions, compare the
    per-column dot products against the re-encoded rows ON DEVICE, and hash
    the column leaves.  The readback is k booleans + k digests instead of the
    (ndt+1, n_cols, L) re-encoded matrix (~4 MB at 2^20) — one round trip,
    latency-floor bound (lcpc-2d/src/lib.rs:862-982)."""
    spec = enc.spec
    lf = limb_field(spec)
    ndt = enc.get_n_degree_tests()

    def make():
        def f(rows_mat, ops, rand_mats, outer_mat, cols_mat, col_idx):
            # rows/cols arrive as uint16 (limbs are 16-bit) and rows at
            # n_per_row width (the codeword tail is structurally zero):
            # 8x less host->device transfer than uint32 x n_cols; widen
            # and zero-pad on device
            rows16 = rows_mat
            rows_mat = jnp.zeros(
                (rows16.shape[0], enc.n_cols, rows16.shape[-1]), jnp.uint32
            ).at[:, : rows16.shape[1], :].set(rows16.astype(jnp.uint32))
            cols_mat = cols_mat.astype(jnp.uint32)
            fft = enc.encode(rows_mat, ops)                  # (ndt+1, n_cols, L)
            sel = jnp.take(fft, col_idx, axis=1)             # (ndt+1, k, L)
            d_rand = lf.dot(cols_mat[None, :, :, :],
                            rand_mats[:, None, :, :], axis=2)  # (ndt, k, L)
            d_eval = lf.dot(cols_mat, outer_mat[None, :, :], axis=1)  # (k, L)
            rand_ok = jnp.all(d_rand == sel[:ndt], axis=-1)  # (ndt, k)
            eval_ok = jnp.all(d_eval == sel[ndt], axis=-1)   # (k,)
            leaves = hash_columns(jnp.transpose(cols_mat, (1, 0, 2)), spec)
            return rand_ok, eval_ok, leaves

        return f

    return _enc_jit(enc, "verify_checks_fused", make)


def _fold_path(leaf: bytes, col_num: int, path: list[bytes]) -> bytes:
    """Merkle path fold, leaf -> root (native blake3 per level)."""
    from ..crypto.blake3_ref import blake3
    h = leaf
    col = col_num
    for p in path:
        h = blake3(h + p) if col % 2 == 0 else blake3(p + h)
        col >>= 1
    return h


def _fold_paths_batch(leaf_bytes: list[bytes], col_nums: list[int],
                      paths: list[list[bytes]] | None,
                      sibs_packed: np.ndarray | None = None) -> list[bytes]:
    """_fold_path for many columns: the whole k x depth fold in ONE native
    call (pos_fold_paths) — the per-LEVEL batched blake3 staging cost
    ~39-77 ms for a Brakedown 2^25 proof's 6593 x 13 fold, mostly in the
    python-side message assembly.  `sibs_packed` ((k, depth, 32) uint8,
    attached by serde/prove) skips re-joining the per-column path bytes.
    Falls back to per-column folds when path lengths differ (malformed
    proofs; the roots then mismatch exactly as the serial fold decides)."""
    k = len(col_nums)
    if k == 0:
        return []
    if paths is None:
        # packed-only call (lazy-path proofs): the (k, depth, 32) array is
        # well-formed by construction, skip the malformed-proof scan
        assert (sibs_packed is not None and sibs_packed.ndim == 3
                and sibs_packed.shape[0] == k and sibs_packed.shape[2] == 32)
        depth = sibs_packed.shape[1]
    else:
        depth = len(paths[0])
    if paths is not None and (
            any(len(p) != depth for p in paths)
            or any(len(e) != 32 for p in paths for e in p)):
        # malformed proofs (wrong path count OR non-32-byte elements) fold
        # serially: blake3 over the raw bytes mismatches the root and the
        # caller raises VerifierError("ColumnPath") — same failure the
        # reference produces, instead of a reshape ValueError here
        return [_fold_path(leaf_bytes[i], col_nums[i], paths[i])
                for i in range(k)]
    h = np.frombuffer(b"".join(leaf_bytes), np.uint8).reshape(k, 32)
    if depth == 0:
        return [h[i].tobytes() for i in range(k)]
    if (sibs_packed is not None and sibs_packed.shape == (k, depth, 32)
            and sibs_packed.dtype == np.uint8):
        sibs = sibs_packed
    else:
        sibs = np.frombuffer(
            b"".join(b"".join(p) for p in paths),
            np.uint8).reshape(k, depth, 32)
    cols = np.asarray(col_nums, np.int64)
    from ..native import blake3_many_native, fold_paths_native
    folded = fold_paths_native(h, sibs, cols)
    if folded is not None:
        return [folded[i].tobytes() for i in range(k)]
    msg = np.empty((k, 64), np.uint8)
    for lvl in range(depth):
        even = ((cols >> lvl) & 1) == 0
        p = sibs[:, lvl]
        msg[even, :32] = h[even]
        msg[even, 32:] = p[even]
        msg[~even, :32] = p[~even]
        msg[~even, 32:] = h[~even]
        out = blake3_many_native(msg)
        if out is None:                       # pure-python fallback
            from ..crypto.blake3_ref import blake3
            out = np.frombuffer(
                b"".join(blake3(msg[i].tobytes()) for i in range(k)),
                np.uint8).reshape(k, 32)
        h = out
    return [h[i].tobytes() for i in range(k)]


def _collapse_kernel_fn(spec: FieldSpec):
    """One-pass collapse (no widened-product HBM transient): the natural
    VPU Pallas kernel (default), the packed VPU kernel, or the int8 MXU
    matmul path (ops/collapse_mxu.py), per LCPC_COLLAPSE_KERNEL."""
    from ..ops.collapse_pallas import collapse_kernel_mode
    return _collapse_kernel_fn_mode(spec, collapse_kernel_mode())


@functools.lru_cache(maxsize=None)
def _collapse_kernel_fn_mode(spec: FieldSpec, mode: str):
    if mode == "mxu":
        from ..ops.collapse_mxu import collapse_tensors_mxu
        return jax.jit(lambda c, t: collapse_tensors_mxu(
            c, t, spec).astype(jnp.uint16))
    from ..ops.collapse_pallas import (collapse_tensors,
                                       collapse_tensors_natural)
    if mode == "natural":
        return jax.jit(lambda c, t: collapse_tensors_natural(
            c, t, spec).astype(jnp.uint16))
    return jax.jit(lambda c, t: collapse_tensors(c, t, spec).astype(
        jnp.uint16))


@functools.lru_cache(maxsize=None)
def _collapse_pack_fn(spec: FieldSpec):
    from ..ops.collapse_pallas import pack_coeffs
    return jax.jit(lambda c: tuple(pack_coeffs(c, spec)))


@functools.lru_cache(maxsize=None)
def _collapse_packed_fn(spec: FieldSpec):
    from ..ops.collapse_pallas import collapse_tensors
    return jax.jit(lambda c, t, pk: collapse_tensors(
        c, t, spec, packed=list(pk)).astype(jnp.uint16))


def _kernel_collapse_cached(comm: "LcCommit", tensors: list[list[int]],
                            spec: FieldSpec):
    """Kernel collapse of several tensors against a commitment, reusing
    the packed operand layout across calls: the (rows, npr, Lp) ->
    npr-minor relayout was ~0.8 s of the measured 0.84 s one-shot
    Brakedown 2^25 collapse, and every prove against the same commitment
    repeats it — cache it on the LcCommit.  With the natural-layout kernel
    (default) there is no packed operand at all: the kernel reads coeffs
    as stored and the first proof costs the same as every later one.
    Returns [(ints, limbs)...]."""
    from ..ops.collapse_pallas import collapse_kernel_mode
    lf = limb_field(spec)
    t = jnp.stack([lf.array(tv) for tv in tensors])
    if collapse_kernel_mode() != "packed":
        out = np.asarray(_collapse_kernel_fn(spec)(comm.coeffs, t),
                         dtype=np.uint32)
        return [(limbs_to_ints(out[i]), out[i]) for i in range(len(tensors))]
    packed = getattr(comm, "_collapse_packed", None)
    if packed is None:
        packed = _collapse_pack_fn(spec)(comm.coeffs)
        comm._collapse_packed = packed
    out = np.asarray(_collapse_packed_fn(spec)(comm.coeffs, t, packed),
                     dtype=np.uint32)
    return [(limbs_to_ints(out[i]), out[i]) for i in range(len(tensors))]


def _use_collapse_kernel(spec: FieldSpec) -> bool:
    from ..ops.collapse_pallas import use_collapse_kernel
    return use_collapse_kernel(spec)


def _collapse(coeff_mat: jnp.ndarray, tensor: list[int], spec: FieldSpec):
    """v = tensor^T . coeffs (lcpc-2d collapse_columns, lib.rs:1126-1154).
    Returns (python ints, (n_per_row, L) limb array)."""
    lf = limb_field(spec)
    if _use_collapse_kernel(spec):
        t = lf.array(tensor)[None]              # (1, n_rows, L)
        out = np.asarray(_collapse_kernel_fn(spec)(coeff_mat, t)[0],
                         dtype=np.uint32)
        return limbs_to_ints(out), out
    t = lf.array(tensor)[:, None, :]            # (n_rows, 1, L)
    out = np.asarray(_collapse_fn(spec)(coeff_mat, t))
    return limbs_to_ints(out), out


@functools.lru_cache(maxsize=None)
def _collapse2_fn(spec: FieldSpec):
    lf = limb_field(spec)
    return jax.jit(lambda c, ta, tb: (
        lambda cw: (lf.dot(cw, ta, axis=0).astype(jnp.uint16),
                    lf.dot(cw, tb, axis=0).astype(jnp.uint16))
    )(c.astype(jnp.uint32)))


def _collapse2(coeff_mat: jnp.ndarray, tensor_a: list[int], tensor_b: list[int],
               spec: FieldSpec):
    """Two collapses against the same matrix in one device round trip.
    Returns (ints_a, ints_b, limbs_a, limbs_b)."""
    lf = limb_field(spec)
    if _use_collapse_kernel(spec):
        t = jnp.stack([lf.array(tensor_a), lf.array(tensor_b)])
        out = np.asarray(_collapse_kernel_fn(spec)(coeff_mat, t),
                         dtype=np.uint32)
        na, nb = out[0], out[1]
        return limbs_to_ints(na), limbs_to_ints(nb), na, nb
    ta = lf.array(tensor_a)[:, None, :]
    tb = lf.array(tensor_b)[:, None, :]
    out_a, out_b = _collapse2_fn(spec)(coeff_mat, ta, tb)
    na, nb = np.asarray(out_a), np.asarray(out_b)
    return limbs_to_ints(na), limbs_to_ints(nb), na, nb


def _append_coeffs(tr: Transcript, label: bytes, vals: list[int],
                   spec: FieldSpec, limbs: np.ndarray | None = None):
    """Append a coefficient vector to the transcript (one repr per value).

    With `limbs` ((n, L) uint32, canonical) the repr bytes come straight out
    of numpy: the LE repr IS the 16-bit limb buffer (BE fields byte-reverse
    per element) — the per-int to_repr loop cost 0.2 s+ on a Brakedown
    2^21 proof's 117k-coefficient rows.  Canonicity (v < p) is enforced
    vectorized, mirroring to_repr's per-value assert: the verifier feeds
    proof values through here, and a v >= p must fail loudly, not produce
    transcript bytes the reference could never emit."""
    if limbs is not None and 2 * limbs.shape[-1] == spec.repr_bytes:
        le = np.ascontiguousarray(
            np.asarray(limbs, np.uint32).astype("<u2"))
        p_limbs = np.frombuffer(
            spec.modulus.to_bytes(2 * le.shape[-1], "little"), "<u2")
        lt = np.zeros(len(le), bool)
        decided = np.zeros(len(le), bool)
        for j in reversed(range(le.shape[-1])):
            a = le[:, j]
            lt |= ~decided & (a < p_limbs[j])
            decided |= a != p_limbs[j]
        if not lt.all():
            # explicit raise (not assert): this guards verifier-reachable
            # proof values and must survive python -O — a non-canonical
            # value would otherwise produce transcript bytes the reference
            # could never emit
            raise ValueError(
                "non-canonical field value in coefficient vector")
        if spec.endianness == "little":
            msgs = le.tobytes()
        else:
            msgs = np.ascontiguousarray(
                le.view(np.uint8).reshape(len(le), -1)[:, ::-1]).tobytes()
        n = len(le)
    else:
        msgs = b"".join(spec.to_repr(v) for v in vals)
        n = len(vals)
    tr.append_messages_batch(label, msgs, spec.repr_bytes, n)


def _columns_to_open(tr: Transcript, n_cols: int, n: int) -> list[int]:
    """Column challenge expansion (lcpc-2d lib.rs:1102-1110), vectorized.

    Consumes the ChaCha stream EXACTLY like the serial widening-multiply
    rejection sampler (every examined u64 is consumed; an accepted draw ends
    one sample), so outputs are bit-identical — pinned by the golden proof
    sha.  Brakedown opens 6593 columns; the serial python loop was ~10 ms+
    per proof on both sides."""
    key = tr.challenge_bytes(LABEL_CO, 32)
    rng = ChaChaRng(key, 20)
    dist = UniformUsize(0, n_cols)
    if n_cols >= (1 << 32):                     # candidates() precondition
        return [dist.sample(rng) for _ in range(n)]
    out: list[int] = []
    while len(out) < n:
        need = n - len(out)
        W = rng.peek_u64_array(need + 8 + need // 8)
        ok, vals = dist.candidates(W)
        idx = np.nonzero(ok)[0]
        if len(idx) >= need:
            take = idx[:need]
            out.extend(int(v) for v in vals[take])
            rng.advance_u64(int(take[-1]) + 1)
        else:                                   # window exhausted mid-run
            out.extend(int(v) for v in vals[idx])
            rng.advance_u64(len(W))
    return out


def _profile_deep() -> bool:
    """LCPC_PROFILE_PROTO=1 splits the prove/verify phase spans into
    device-execute vs transfer legs by forcing a 4-byte sync between them
    (each split costs one extra ~32 ms tunnel dispatch — profiling only)."""
    import os as _os
    return _os.environ.get("LCPC_PROFILE_PROTO") == "1"


def _force_exec(x) -> None:
    """Force a device array's producer to complete via a one-element
    readback (axon's block_until_ready is effectively async)."""
    _ = int(jnp.reshape(x, (-1,))[0].astype(jnp.uint32))


def prove(comm: LcCommit, outer_tensor: list[int], enc: LcEncoding,
          tr: Transcript) -> LcEvalProof:
    """lcpc-2d/src/lib.rs:1034-1123.

    Phase spans (utils/profiling.GLOBAL_PHASES, actor="prove") mirror the
    reference's per-handler instrumentation; LCPC_PROFILE_PROTO=1 adds the
    device-vs-readback split for the column opening."""
    check_comm(comm, enc)
    if len(outer_tensor) != comm.n_rows:
        raise ProverError("outer tensor: wrong size")
    spec = enc.spec

    # out-of-core commitment (commit_streamed keep_comm=False): collapses
    # run in row batches and the opened columns are re-encoded on demand
    streamed = comm.comm is None

    # The one-shot collapse materializes the full widened product
    # (rows, n_per_row, 2L+1) u32 — 8.8 GB at 2^25 ft255, which next to the
    # coefficient matrix thrashes a 16 GB chip (measured: 8.6 s instead of
    # ~1 s).  Large matrices collapse through the row-batched accumulator
    # even when the commitment itself is one-shot / host-resident.
    import os as _os
    n_rows_c, n_per_row_c, Lc = comm.coeffs.shape
    transient_bytes = n_rows_c * n_per_row_c * (2 * Lc + 1) * 4
    # The one-pass Pallas collapse has NO widened-product transient (the
    # accumulator lives in VMEM) — device-resident coefficients always
    # collapse one-shot through it; host-resident coefficients (keep_comm
    # host mode / device_coeffs=False) still batch so the upload streams.
    kernel_collapse = (not isinstance(comm.coeffs, np.ndarray)
                       and _use_collapse_kernel(spec))
    batched_collapse = not kernel_collapse and (
        streamed or transient_bytes > float(
            _os.environ.get("LCPC_COLLAPSE_TRANSIENT_BYTES", "2e9")))

    # The eval collapse uses only the caller-supplied outer tensor, so it
    # shares a device round trip with the first degree-test collapse; the
    # transcript evolution (squeeze rand_i -> append p_random_i -> ... ->
    # append p_eval) is unchanged.
    p_random_vec = []
    p_eval = pe_limbs = None
    for i in range(enc.get_n_degree_tests()):
        with _phase("challenge", "prove"):
            rand_tensor = _challenge_tensor(tr, spec, comm.n_rows)
        with _phase("collapse", "prove"):
            if i == 0:
                if kernel_collapse:
                    (p_random, pr_limbs), (p_eval, pe_limbs) = \
                        _kernel_collapse_cached(
                            comm, [rand_tensor, outer_tensor], spec)
                elif batched_collapse:
                    from .streamed import collapse_streamed
                    (p_random, pr_limbs), (p_eval, pe_limbs) = \
                        collapse_streamed(comm, enc,
                                          [rand_tensor, outer_tensor])
                else:
                    p_random, p_eval, pr_limbs, pe_limbs = _collapse2(
                        comm.coeffs, rand_tensor, outer_tensor, spec)
            else:
                if kernel_collapse:
                    (p_random, pr_limbs), = _kernel_collapse_cached(
                        comm, [rand_tensor], spec)
                elif batched_collapse:
                    from .streamed import collapse_streamed
                    (p_random, pr_limbs), = collapse_streamed(
                        comm, enc, [rand_tensor])
                else:
                    p_random, pr_limbs = _collapse(comm.coeffs, rand_tensor,
                                                   spec)
        with _phase("transcript", "prove"):
            _append_coeffs(tr, LABEL_PR, p_random, spec, limbs=pr_limbs)
        p_random_vec.append(_LimbRow(
            p_random, None if pr_limbs is None
            else np.asarray(pr_limbs, np.uint32)))

    if p_eval is None:
        with _phase("collapse", "prove"):
            p_eval, pe_limbs = _collapse(comm.coeffs, outer_tensor, spec)
    with _phase("transcript", "prove"):
        _append_coeffs(tr, LABEL_PE, p_eval, spec, limbs=pe_limbs)

    with _phase("sample", "prove"):
        cols_to_open = _columns_to_open(tr, comm.n_cols,
                                        enc.get_n_col_opens())
    # batched column extraction on device (one readback), limbs kept as-is.
    # A streamed commit keeps comm in host RAM (np.ndarray) or re-encodes
    # on demand; a one-shot commit gathers columns AND sibling paths from
    # the device-resident arrays in ONE fused call (uint16 columns: limbs
    # are 16-bit, half the device->host transfer).
    paths = None
    paths_packed = None
    if streamed:
        with _phase("open", "prove"):
            from .streamed import open_columns_streamed
            cols_arr = open_columns_streamed(comm, enc, cols_to_open)
    elif isinstance(comm.comm, np.ndarray):
        with _phase("open", "prove"):
            cols_arr = comm.comm[:, np.asarray(cols_to_open), :]
    elif comm._hashes_np is None:
        depth = ceil_log2(comm.n_cols)
        gather = _enc_jit(enc, "prove_gather_paths", lambda: (
            lambda c, h, cidx, pidx: (
                jnp.take(c, cidx, axis=1).astype(jnp.uint16),
                jnp.take(h, pidx, axis=0))))
        with _phase("open_device", "prove"):
            cols16, sibs = gather(
                comm.comm, comm._hashes_dev,
                jnp.asarray(cols_to_open, jnp.int32),
                jnp.asarray(_path_indices(comm.n_cols, cols_to_open),
                            jnp.int32))
            if _profile_deep():
                _force_exec(cols16)          # split exec from the readback
        with _phase("open_readback", "prove"):
            cols_arr = np.asarray(cols16).astype(np.uint32)  # (rows, k, L)
            sibs_np = np.asarray(sibs)
        with _phase("paths", "prove"):
            # packed only — LcColumn.path materializes byte lists lazily
            paths_packed = _packed_from_sibs(sibs_np, len(cols_to_open),
                                             depth)
    else:
        gather = _enc_jit(enc, "prove_gather", lambda: (
            lambda c, idx: jnp.take(c, idx, axis=1).astype(jnp.uint16)))
        with _phase("open_device", "prove"):
            cols16 = gather(comm.comm, jnp.asarray(cols_to_open, jnp.int32))
            if _profile_deep():
                _force_exec(cols16)
        with _phase("open_readback", "prove"):
            cols_arr = np.asarray(cols16).astype(np.uint32)  # (rows, k, L)
    if paths is None:
        with _phase("paths", "prove"):
            paths = merkle_paths_batch(comm, cols_to_open)
    with _phase("build", "prove"):
        # packed (k, rows, L) with per-column views: verify()'s staging can
        # then use the packed array directly instead of re-stacking k
        # columns (370 ms of the Brakedown 2^25 verify was np.stack over
        # 6593 col_limbs calls)
        packed = np.ascontiguousarray(cols_arr.transpose(1, 0, 2))
        if paths_packed is not None:
            columns = [
                LcColumn(col_limbs=packed[i], spec=spec,
                         sibs=paths_packed, sib_idx=i)
                for i in range(len(cols_to_open))
            ]
        else:
            columns = [
                LcColumn(col_limbs=packed[i], spec=spec, path=paths[i])
                for i in range(len(cols_to_open))
            ]

    proof = LcEvalProof(
        n_cols=comm.n_cols,
        p_eval=_LimbRow(p_eval, None if pe_limbs is None
                        else np.asarray(pe_limbs, np.uint32)),
        p_random_vec=p_random_vec, columns=columns)
    proof._cols_packed = packed
    if paths_packed is not None:
        proof._paths_packed = paths_packed    # verify's fold fast path
    return proof


# --------------------------------------------------------------------------
# verify
# --------------------------------------------------------------------------

def _encode_rows_limbs(rows: list[list[int]], enc: LcEncoding) -> np.ndarray:
    """Encode coefficient rows in ONE device call; returns (n, n_cols, L)
    limbs (the verifier compares limb rows directly — converting 32k entries
    to python ints per proof would dominate verify time)."""
    lf = limb_field(enc.spec)
    mat = np.zeros((len(rows), enc.n_cols, lf.L), np.uint32)
    for i, vals in enumerate(rows):
        mat[i, : len(vals), :] = ints_to_limbs(vals, enc.spec)
    if enc.mesh is not None:
        # wide verifier: re-encode with the cross-chip NTT, eagerly (the
        # shard_map compiles itself; an outer jit would bake the cross-chip
        # twiddles into the HLO as multi-MB literals)
        return np.asarray(enc.encode(jnp.asarray(mat), None))
    encode = _enc_jit(enc, "encode_row",
                      lambda: lambda m, ops: enc.encode(m, ops))
    return np.asarray(encode(jnp.asarray(mat), enc.device_operands()))


def _fold_paths_generic(leaf_bytes: list[bytes], col_nums: list[int],
                        paths: list[list[bytes]], d) -> list[bytes]:
    """_fold_paths_batch for a generic host digest (crypto/digest.py)."""
    out = []
    for leaf, col, path in zip(leaf_bytes, col_nums, paths):
        h = leaf
        c = col
        for p in path:
            h = d.hash(h + p) if c % 2 == 0 else d.hash(p + h)
            c >>= 1
        out.append(h)
    return out


def verify(root: bytes, outer_tensor: list[int], inner_tensor: list[int],
           proof: LcEvalProof, enc: LcEncoding, tr: Transcript,
           digest: str = "blake3") -> int:
    """lcpc-2d/src/lib.rs:862-982.  Returns the evaluation <inner, p_eval>.

    `digest` must match the committer's (the root binds it); non-blake3
    digests hash column leaves and fold paths on the host."""
    spec = enc.spec
    lf = limb_field(spec)

    n_col_opens = enc.get_n_col_opens()
    if n_col_opens != len(proof.columns) or n_col_opens == 0:
        raise VerifierError("NumColOpens")
    n_rows = len(proof.columns[0])
    n_cols = proof.get_n_cols()
    n_per_row = proof.get_n_per_row()
    if len(inner_tensor) != n_per_row:
        raise VerifierError("InnerTensor")
    if len(outer_tensor) != n_rows:
        raise VerifierError("OuterTensor")
    if not enc.dims_ok(n_per_row, n_cols):
        raise VerifierError("EncodingDims")

    # limb forms of the proof rows, converted once: used for the transcript
    # appends (vectorized repr bytes) AND the re-encode row matrix below.
    # prove()/serde ship rows as limb-backed _LimbRow lists so the verifier
    # skips the per-int conversion (~83 ms of the r4 Brakedown 2^25 verify)
    with _phase("limbs", "verify"):
        row_limbs = [_row_limbs_of(v, spec)
                     for v in proof.p_random_vec + [proof.p_eval]]

    with _phase("transcript", "verify"):
        rand_tensor_vec = []
        for i in range(enc.get_n_degree_tests()):
            rand_tensor = _challenge_tensor(tr, spec, n_rows)
            rand_tensor_vec.append(rand_tensor)
            _append_coeffs(tr, LABEL_PR, proof.p_random_vec[i], spec,
                           limbs=row_limbs[i])

        _append_coeffs(tr, LABEL_PE, proof.p_eval, spec, limbs=row_limbs[-1])
    with _phase("sample", "verify"):
        cols_to_open = _columns_to_open(tr, n_cols, n_col_opens)

    # len(c) reads the limb array without materializing ._col (python ints);
    # materializing here would permanently disable the packed staging fast
    # path below for every proof
    if any(len(c) != n_rows for c in proof.columns):
        # ragged opened columns: the reference's per-column zip silently
        # truncates the dot products but such a proof can never verify (the
        # leaf hash covers the full column) — reject cleanly instead of
        # letting np.stack throw
        raise VerifierError("OuterTensor", "ragged column lengths")
    with _phase("stage", "verify"):
        packed = getattr(proof, "_cols_packed", None)
        if (packed is not None and packed.shape[0] == len(proof.columns)
                and all(c._col is None and c._limbs is not None
                        and c._limbs.base is packed
                        for c in proof.columns)):
            # prove()/serde attached the packed (k, rows, L) array and no
            # column was materialized (and possibly mutated) as ints since
            cols_np = packed
        else:
            cols_np = np.stack(
                [c.col_limbs(spec) for c in proof.columns])         # (k, rows, L)
        rand_mats = jnp.stack([lf.array(t) for t in rand_tensor_vec])
        outer_mat = lf.array(outer_tensor)                          # (rows, L)
    n_degree = enc.get_n_degree_tests()

    if enc.mesh is not None:
        # wide verifier: the cross-chip encode runs its own shard_map program,
        # so keep the two-call shape (encode readback + column checks)
        all_fft = _encode_rows_limbs(proof.p_random_vec + [proof.p_eval], enc)
        p_random_fft = [all_fft[i] for i in range(n_degree)]
        p_eval_fft = all_fft[-1]
        d_rand, d_eval, leaves = _column_checks_fn(spec)(
            jnp.asarray(cols_np), rand_mats, outer_mat)
        d_rand = np.asarray(d_rand)
        d_eval = np.asarray(d_eval)
        rand_ok_arr = np.array([
            [np.array_equal(d_rand[i, k], p_random_fft[i][c])
             for k, c in enumerate(cols_to_open)] for i in range(n_degree)])
        eval_ok_arr = np.array([np.array_equal(d_eval[k], p_eval_fft[c])
                                for k, c in enumerate(cols_to_open)])
    else:
        # single chip: re-encode (degree-test rows + eval row), column dots,
        # on-device equality, and leaf digests fused in ONE device call —
        # the encodes never touch the transcript, so hoisting them below the
        # challenge squeezes leaves the Fiat-Shamir evolution unchanged
        lfL = lf.L
        # row matrix width: normally n_per_row, but a malformed proof may
        # carry longer p_random rows — the reference copies each row into an
        # n_cols buffer and truncates (lib.rs:913-916 extend + resize), so
        # widen to the longest row (capped at n_cols) rather than crash;
        # the extra coefficients then fail ColumnDegree exactly like there
        width = min(n_cols, max([n_per_row] + [len(l) for l in row_limbs]))
        with _phase("stage", "verify"):
            rows_mat = np.zeros((n_degree + 1, width, lfL), np.uint16)
            for i, limbs in enumerate(row_limbs):
                rows_mat[i, : min(len(limbs), width), :] = limbs[:width]
        with _phase("upload", "verify"):
            rows_dev = jnp.asarray(rows_mat)
            cols_dev = jnp.asarray(cols_np.astype(np.uint16))
            open_dev = jnp.asarray(cols_to_open, jnp.int32)
            if _profile_deep():
                _force_exec(cols_dev)        # split upload from execute
        with _phase("device", "verify"):
            rand_ok_dev, eval_ok_dev, leaves = _verify_checks_fused(enc)(
                rows_dev, enc.device_operands(), rand_mats,
                outer_mat, cols_dev, open_dev)
            if _profile_deep():
                _force_exec(leaves)
        with _phase("readback", "verify"):
            rand_ok_arr = np.asarray(rand_ok_dev)
            eval_ok_arr = np.asarray(eval_ok_dev)

    with _phase("fold", "verify"):
        if digest != "blake3":
            # generic digest: leaves + path folds on the host (the device
            # `leaves` are blake3 and are ignored); dots/equalities above
            # are digest-independent
            from ..crypto.digest import column_leaves_host, get_digest
            d = get_digest(digest)
            leaf_rows = column_leaves_host(
                cols_np.transpose(1, 0, 2), spec, d)        # (k, 32)
            leaf_bytes = [leaf_rows[i].tobytes()
                          for i in range(leaf_rows.shape[0])]
            folded = _fold_paths_generic(leaf_bytes, cols_to_open,
                                         [c.path for c in proof.columns], d)
        else:
            leaf_bytes = digests_to_bytes(np.asarray(leaves))
            # the packed sibling array is only trusted while EVERY column
            # is still lazily backed by it (c._path is None): a
            # materialized .path list is authoritative (it may have been
            # mutated — tamper tests rely on that), so any materialization
            # forfeits the fast path for the whole fold
            sp = getattr(proof, "_paths_packed", None)
            packed_ok = (sp is not None and sp.ndim == 3
                         and sp.shape[0] == len(proof.columns)
                         and sp.shape[2] == 32
                         and all(c._path is None and c._sibs is sp
                                 for c in proof.columns))
            folded = _fold_paths_batch(
                leaf_bytes, cols_to_open,
                None if packed_ok else [c.path for c in proof.columns],
                sibs_packed=sp if packed_ok else None)
    for k, (col_num, column) in enumerate(zip(cols_to_open, proof.columns)):
        rand_ok = all(rand_ok_arr[i][k] for i in range(n_degree))
        eval_ok = bool(eval_ok_arr[k])
        path_ok = folded[k] == root
        if not rand_ok:
            raise VerifierError("ColumnDegree", f"column {col_num}")
        if not eval_ok:
            raise VerifierError("ColumnEval", f"column {col_num}")
        if not path_ok:
            raise VerifierError("ColumnPath", f"column {col_num}")

    # result = <inner_tensor, p_eval>.  Sum raw products, one mod at the
    # end: the partial sum of n 2w-bit products stays ~(2w + log2 n) bits,
    # and dropping the per-step reduction halves this leg (50 ms vs 120 ms
    # for the 235k-coefficient Brakedown 2^25 eval row)
    with _phase("eval", "verify"):
        return sum(t * e for t, e in zip(inner_tensor, proof.p_eval)) \
            % spec.modulus
