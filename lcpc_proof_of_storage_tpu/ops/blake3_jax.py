"""Vectorized Blake3 for TPU: batched equal-length messages (columns).

TPU-native replacement for the reference's rayon column-hash loops
(lcpc-2d/src/lib.rs:736-775 hash_columns, 792-815 merkle_layer).  All
columns of the encoded matrix are hashed simultaneously: chunk compressions
vectorize over (column, chunk), the chunk tree merges vectorize over
columns, and Merkle layers vectorize over nodes.  Pure uint32 VPU ops.

Digests are (..., 8) uint32 word arrays; bytes conversion (little-endian
words) happens at the host boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import FieldSpec
from ..crypto import blake3_ref as b3

U32 = jnp.uint32

IV = np.array(b3.IV, dtype=np.uint32)

CHUNK_START = b3.CHUNK_START
CHUNK_END = b3.CHUNK_END
PARENT = b3.PARENT
ROOT = b3.ROOT


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _round_schedules() -> np.ndarray:
    """(7, 16) message word indices after r applications of the permutation."""
    idx = np.arange(16)
    out = []
    for _ in range(7):
        out.append(idx.copy())
        idx = idx[np.array(b3.MSG_PERMUTATION)]
    return np.stack(out)


_SCHED = _round_schedules()


def compress8_xp(xp, cv, m, counter_lo, counter_hi, block_len, flags):
    """Batched Blake3 compression, generic over jnp / numpy module `xp`;
    returns first 8 output words.

    cv: (..., 8) uint32; m: (..., 16) uint32; counter/block_len/flags:
    scalars or broadcastable uint32 arrays.

    Uses the 4-lane SIMD formulation (state as a 4x4 grid; diagonal rounds
    via lane rotations) so the XLA graph is ~8x smaller than a scalar
    unroll — both VPU-friendlier and far cheaper to compile.
    """
    u32 = xp.uint32
    shape = cv.shape[:-1]
    r0 = cv[..., 0:4]
    r1 = cv[..., 4:8]
    r2 = xp.broadcast_to(xp.asarray(IV[:4]), (*shape, 4))
    r3 = xp.stack([
        xp.broadcast_to(xp.asarray(counter_lo, u32), shape),
        xp.broadcast_to(xp.asarray(counter_hi, u32), shape),
        xp.broadcast_to(xp.asarray(block_len, u32), shape),
        xp.broadcast_to(xp.asarray(flags, u32), shape),
    ], axis=-1)

    def quad_g(a, b, c, d, mx, my):
        a = a + b + mx
        d = _rotr(d ^ a, 16)
        c = c + d
        b = _rotr(b ^ c, 12)
        a = a + b + my
        d = _rotr(d ^ a, 8)
        c = c + d
        b = _rotr(b ^ c, 7)
        return a, b, c, d

    for rnd in range(7):
        ms = m[..., _SCHED[rnd]]
        # column round
        r0, r1, r2, r3 = quad_g(r0, r1, r2, r3,
                                ms[..., 0:8:2], ms[..., 1:8:2])
        # diagonal round: rotate rows left by 1/2/3, operate, rotate back
        r1 = xp.roll(r1, -1, axis=-1)
        r2 = xp.roll(r2, -2, axis=-1)
        r3 = xp.roll(r3, -3, axis=-1)
        r0, r1, r2, r3 = quad_g(r0, r1, r2, r3,
                                ms[..., 8:16:2], ms[..., 9:16:2])
        r1 = xp.roll(r1, 1, axis=-1)
        r2 = xp.roll(r2, 2, axis=-1)
        r3 = xp.roll(r3, 3, axis=-1)

    return xp.concatenate([r0 ^ r2, r1 ^ r3], axis=-1)


def compress8(cv, m, counter_lo, counter_hi, block_len, flags):
    """jnp variant of compress8_xp (device kernels)."""
    return compress8_xp(jnp, cv, m, counter_lo, counter_hi, block_len, flags)


def compress8_np(cv, m, counter_lo, counter_hi, block_len, flags):
    """numpy variant (host-side incremental column accumulator)."""
    return compress8_xp(np, cv, m, counter_lo, counter_hi, block_len, flags)


@functools.lru_cache(maxsize=None)
def _chunk_tables(msg_len_bytes: int) -> tuple:
    """Static per-(block, chunk) tables: lens, flags, active masks, counters."""
    nchunks = max(1, (msg_len_bytes + b3.CHUNK_LEN - 1) // b3.CHUNK_LEN)
    single = nchunks == 1
    lens = np.zeros((16, nchunks), np.uint32)
    flags = np.zeros((16, nchunks), np.uint32)
    active = np.zeros((16, nchunks), np.uint32)
    for c in range(nchunks):
        clen = msg_len_bytes - c * b3.CHUNK_LEN if c == nchunks - 1 else b3.CHUNK_LEN
        nblocks = max(1, (clen + b3.BLOCK_LEN - 1) // b3.BLOCK_LEN)
        for bidx in range(nblocks):
            blen = 0 if clen == 0 else min(b3.BLOCK_LEN, clen - bidx * b3.BLOCK_LEN)
            f = 0
            if bidx == 0:
                f |= CHUNK_START
            if bidx == nblocks - 1:
                f |= CHUNK_END
                if single:
                    f |= ROOT
            lens[bidx, c] = blen
            flags[bidx, c] = f
            active[bidx, c] = 1
    counters = np.arange(nchunks, dtype=np.uint32)
    return lens, flags, active, counters


def blake3_batch_words(msg_words: jnp.ndarray, msg_len_bytes: int) -> jnp.ndarray:
    """Hash a batch of equal-length messages given as LE u32 words.

    msg_words: (batch, ceil(msg_len_bytes/4)) uint32, zero-padded in the
    final partial word (matches byte-stream semantics for len % 4 != 0).
    Returns (batch, 8) uint32 digests.

    Structure: the 16 block compressions of every chunk run as one lax.scan
    (chunk axis fully parallel); the chunk tree is merged level-by-level,
    each level one batched parent compression.  The pairwise-with-carry
    level merge is equivalent to Blake3's left-leaning tree.
    """
    batch = msg_words.shape[0]
    nchunks = max(1, (msg_len_bytes + b3.CHUNK_LEN - 1) // b3.CHUNK_LEN)
    chunk_words = b3.CHUNK_LEN // 4
    pad = nchunks * chunk_words - msg_words.shape[1]
    if pad:
        msg_words = jnp.pad(msg_words, ((0, 0), (0, pad)))
    # (block, batch, chunk, word) for scanning over blocks
    chunks = msg_words.reshape(batch, nchunks, 16, 16).transpose(2, 0, 1, 3)

    lens, flags, active, counters = _chunk_tables(msg_len_bytes)

    def block_step(cv, xs):
        block, blen, bflags, act = xs
        new = compress8(cv, block, counters, np.uint32(0), blen, bflags)
        cv = jnp.where((act > 0)[None, :, None], new, cv)
        return cv, None

    # under shard_map the scanned message is varying over the mesh axes;
    # the initial carry must match or the scan's type check rejects it
    from .vma import match_vma
    cv0 = match_vma(jnp.broadcast_to(jnp.asarray(IV), (batch, nchunks, 8)),
                    msg_words)
    cvs, _ = jax.lax.scan(
        block_step, cv0,
        (chunks, jnp.asarray(lens), jnp.asarray(flags), jnp.asarray(active)))

    if nchunks == 1:
        return cvs[:, 0, :]
    return merge_chunk_cvs(cvs)


def merge_chunk_cvs(cvs: jnp.ndarray) -> jnp.ndarray:
    """(batch, k >= 2, 8) chunk CVs (ALL chunks of each message, in order)
    -> (batch, 8) digests.  Pairwise-with-carry level merge == blake3's
    left-leaning tree (the oracle blake3_batch_words shares this code)."""
    batch, k, _ = cvs.shape
    nodes = cvs
    while k > 1:
        pairs = k // 2
        blocks = nodes[:, : 2 * pairs, :].reshape(batch, pairs, 16)
        is_root = (k == 2)
        f = np.uint32(PARENT | (ROOT if is_root else 0))
        parents = compress8(
            jnp.broadcast_to(jnp.asarray(IV), (batch, pairs, 8)),
            blocks, np.uint32(0), np.uint32(0), np.uint32(b3.BLOCK_LEN), f)
        if k % 2:
            parents = jnp.concatenate([parents, nodes[:, -1:, :]], axis=1)
        nodes = jax.lax.optimization_barrier(parents)
        k = parents.shape[1]
    return nodes[:, 0, :]


@functools.lru_cache(maxsize=None)
def _chunk_tables_slice(k: int, tail_len: int) -> tuple:
    """Per-(block, chunk) tables for k consecutive whole chunks of a multi-
    chunk message.  Chunk flags (CHUNK_START/CHUNK_END) are per-chunk, not
    per-message, so the tables depend only on k and tail_len — the byte
    length of the slice's final chunk (1024 when full; shorter only when it
    is the partial LAST chunk of the message).  The chunk counter is a
    traced argument to chunk_cvs_words, so interior row batches of a
    streamed commit share one compilation."""
    assert 1 <= tail_len <= b3.CHUNK_LEN
    lens = np.zeros((16, k), np.uint32)
    flags = np.zeros((16, k), np.uint32)
    active = np.zeros((16, k), np.uint32)
    for j in range(k):
        clen = tail_len if j == k - 1 else b3.CHUNK_LEN
        nblocks = max(1, (clen + b3.BLOCK_LEN - 1) // b3.BLOCK_LEN)
        for bidx in range(nblocks):
            blen = min(b3.BLOCK_LEN, clen - bidx * b3.BLOCK_LEN)
            f = 0
            if bidx == 0:
                f |= CHUNK_START
            if bidx == nblocks - 1:
                f |= CHUNK_END
            lens[bidx, j] = blen
            flags[bidx, j] = f
            active[bidx, j] = 1
    return lens, flags, active


def chunk_cvs_words(msg_words: jnp.ndarray, counters: jnp.ndarray,
                    tail_len: int = b3.CHUNK_LEN) -> jnp.ndarray:
    """CVs of k consecutive whole chunks of equal-length multi-chunk
    messages.

    msg_words: (batch, k*256) uint32 — those chunks' words, zero-padded
    past the message end when the slice's last chunk is the message's
    partial final chunk (then pass its byte length as tail_len).
    counters: (k,) uint32 global chunk indices — may be traced.  The
    streamed commit hashes columns incrementally with this: each row batch
    contributes whole chunks, the CVs accumulate, merge_chunk_cvs at the
    end.  Returns (batch, k, 8)."""
    batch, nw = msg_words.shape
    k = nw // (b3.CHUNK_LEN // 4)
    assert nw == k * (b3.CHUNK_LEN // 4)
    chunks = msg_words.reshape(batch, k, 16, 16).transpose(2, 0, 1, 3)
    lens, flags, active = _chunk_tables_slice(k, tail_len)
    counters = jnp.asarray(counters, U32)

    def block_step(cv, xs):
        block, blen, bflags, act = xs
        new = compress8(cv, block, counters, np.uint32(0), blen, bflags)
        cv = jnp.where((act > 0)[None, :, None], new, cv)
        return cv, None

    from .vma import match_vma
    cv0 = match_vma(jnp.broadcast_to(jnp.asarray(IV), (batch, k, 8)),
                    msg_words)
    cvs, _ = jax.lax.scan(
        block_step, cv0,
        (chunks, jnp.asarray(lens), jnp.asarray(flags), jnp.asarray(active)))
    return cvs


# --------------------------------------------------------------------------
# field-element column hashing
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _byte_gather_plan(spec: FieldSpec) -> tuple:
    """For each output LE-u32 word of one element's repr bytes: list of
    4 (limb_index, limb_shift) byte sources."""
    W = spec.repr_bytes
    plan = []
    for w in range(W // 4):
        srcs = []
        for b in range(4):
            k = 4 * w + b          # byte index within repr
            if spec.endianness == "little":
                vb = k              # byte k of value (LE)
            else:
                vb = W - 1 - k      # BE repr: byte k is value byte W-1-k
            srcs.append((vb // 2, 8 * (vb % 2)))
        plan.append(tuple(srcs))
    return tuple(plan)


def limbs_to_repr_words(elems: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """(..., L) limbs -> (..., W/4) uint32 LE words of the canonical repr."""
    plan = _byte_gather_plan(spec)
    words = []
    for srcs in plan:
        word = jnp.zeros(elems.shape[:-1], U32)
        for pos, (limb, shift) in enumerate(srcs):
            byte = (elems[..., limb] >> np.uint32(shift)) & np.uint32(0xFF)
            word = word | (byte << np.uint32(8 * pos))
        words.append(word)
    return jnp.stack(words, axis=-1)


def hash_columns(comm: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Leaf digests of all columns of an encoded matrix.

    comm: (n_rows, n_cols, L) limb array.  Column hash = blake3(32 zero
    bytes || column elements' reprs) — the zero-block leaf domain separation
    of the reference (lcpc-2d/src/lib.rs:752-753).
    Returns (n_cols, 8) uint32 digests.
    """
    n_rows, n_cols, _ = comm.shape
    words = limbs_to_repr_words(comm, spec)          # (rows, cols, W/4)
    words = jnp.transpose(words, (1, 0, 2)).reshape(n_cols, -1)
    zeros = jnp.zeros((n_cols, 8), U32)
    msg = jnp.concatenate([zeros, words], axis=1)
    msg_len = 32 + n_rows * spec.repr_bytes
    return blake3_batch_words(msg, msg_len)


def hash_field_vec(elems: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """blake3(32 zero bytes || elems reprs) for a single vector (n, L) -> (8,)."""
    return hash_columns(elems[:, None, :], spec)[0]


def merkle_parents(nodes: jnp.ndarray) -> jnp.ndarray:
    """One Merkle layer: (2k, 8) digests -> (k, 8) parents.

    Parent = blake3(left_bytes || right_bytes): a 64-byte single-chunk
    message (NOT blake3's internal parent mode — the reference hashes
    concatenated digests with a fresh Digest, lib.rs:800-806).
    """
    pairs = nodes.reshape(-1, 16)
    flags = np.uint32(CHUNK_START | CHUNK_END | ROOT)
    return compress8(jnp.broadcast_to(jnp.asarray(IV), (pairs.shape[0], 8)),
                     pairs, np.uint32(0), np.uint32(0), np.uint32(64), flags)


def digests_to_bytes(digests: np.ndarray) -> list[bytes]:
    """(n, 8) uint32 -> list of 32-byte digests (LE words)."""
    arr = np.asarray(digests, dtype="<u4")
    return [arr[i].tobytes() for i in range(arr.shape[0])]


def digest_to_bytes(digest: np.ndarray) -> bytes:
    return np.asarray(digest, dtype="<u4").tobytes()


def bytes_to_digest(data: bytes) -> np.ndarray:
    assert len(data) == 32
    return np.frombuffer(data, dtype="<u4").astype(np.uint32)
