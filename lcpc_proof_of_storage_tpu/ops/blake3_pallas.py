"""Pallas TPU kernel for Blake3 column hashing.

One VMEM pass per column tile: the full column byte stream (zero-prefix
block + all rows' reprs) is hashed chunk-by-chunk inside the kernel —
state words live on sublanes, columns on lanes (16, C) — including the
chunk-tree merge.  Bit-identical to ops/blake3_jax.hash_columns (which is
itself validated against the spec reference).

Layout: the caller provides words in column-major (n_words, n_cols) form;
the limb->repr-word conversion and transpose stay in XLA (one pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto import blake3_ref as b3
from ..fields.field import FieldSpec
from .blake3_jax import IV, _SCHED, limbs_to_repr_words

U32 = jnp.uint32

_HASH_TILE = 256           # columns per kernel instance


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress_cols(cv, m, counter: int, block_len: int, flags: int):
    """Compression with state words on sublanes: cv (8, C), m (16, C)."""
    C = cv.shape[1]
    r0 = cv[0:4]
    r1 = cv[4:8]
    r2 = jnp.concatenate([jnp.full((1, C), np.uint32(IV[i]), U32)
                          for i in range(4)], axis=0)
    r3 = jnp.concatenate([
        jnp.full((1, C), np.uint32(counter & 0xFFFFFFFF), U32),
        jnp.full((1, C), np.uint32(counter >> 32), U32),
        jnp.full((1, C), np.uint32(block_len), U32),
        jnp.full((1, C), np.uint32(flags), U32),
    ], axis=0)

    def quad_g(a, bq, c, d, mx, my):
        a = a + bq + mx
        d = _rotr(d ^ a, 16)
        c = c + d
        bq = _rotr(bq ^ c, 12)
        a = a + bq + my
        d = _rotr(d ^ a, 8)
        c = c + d
        bq = _rotr(bq ^ c, 7)
        return a, bq, c, d

    for rnd in range(7):
        sched = _SCHED[rnd]
        col_x = jnp.concatenate([m[sched[2 * i] : sched[2 * i] + 1]
                                 for i in range(4)], axis=0)
        col_y = jnp.concatenate([m[sched[2 * i + 1] : sched[2 * i + 1] + 1]
                                 for i in range(4)], axis=0)
        r0, r1, r2, r3 = quad_g(r0, r1, r2, r3, col_x, col_y)
        diag_x = jnp.concatenate([m[sched[8 + 2 * i] : sched[8 + 2 * i] + 1]
                                  for i in range(4)], axis=0)
        diag_y = jnp.concatenate([m[sched[9 + 2 * i] : sched[9 + 2 * i] + 1]
                                  for i in range(4)], axis=0)
        # rotate-left by k == roll by 4-k (avoid negative shifts in Mosaic)
        r1 = pltpu.roll(r1, 3, 0)
        r2 = pltpu.roll(r2, 2, 0)
        r3 = pltpu.roll(r3, 1, 0)
        r0, r1, r2, r3 = quad_g(r0, r1, r2, r3, diag_x, diag_y)
        r1 = pltpu.roll(r1, 1, 0)
        r2 = pltpu.roll(r2, 2, 0)
        r3 = pltpu.roll(r3, 3, 0)

    return jnp.concatenate([r0 ^ r2, r1 ^ r3], axis=0)


def _hash_kernel(msg_len_bytes: int):
    """Kernel hashing one tile of columns; input (n_words_pad, C) words."""
    nchunks = max(1, (msg_len_bytes + b3.CHUNK_LEN - 1) // b3.CHUNK_LEN)

    def kernel(w_ref, out_ref):
        words = w_ref[:]
        C = words.shape[1]
        cvs = []
        for c in range(nchunks):
            clen = (msg_len_bytes - c * b3.CHUNK_LEN
                    if c == nchunks - 1 else b3.CHUNK_LEN)
            nblocks = max(1, (clen + b3.BLOCK_LEN - 1) // b3.BLOCK_LEN)
            cv = jnp.concatenate([jnp.full((1, C), np.uint32(IV[i]), U32)
                                  for i in range(8)], axis=0)
            for bidx in range(nblocks):
                blen = 0 if clen == 0 else min(b3.BLOCK_LEN,
                                               clen - bidx * b3.BLOCK_LEN)
                flags = 0
                if bidx == 0:
                    flags |= b3.CHUNK_START
                if bidx == nblocks - 1:
                    flags |= b3.CHUNK_END
                    if nchunks == 1:
                        flags |= b3.ROOT
                base = c * 256 + bidx * 16
                m = words[base : base + 16]
                cv = _compress_cols(cv, m, c, blen, flags)
            cvs.append(cv)

        # pairwise-with-carry merge == blake3 left-leaning tree
        nodes = cvs
        while len(nodes) > 1:
            nxt = []
            for k in range(0, len(nodes) - 1, 2):
                block = jnp.concatenate([nodes[k], nodes[k + 1]], axis=0)
                is_root = len(nodes) == 2
                f = b3.PARENT | (b3.ROOT if is_root else 0)
                nxt.append(_compress_cols(
                    jnp.concatenate([jnp.full((1, block.shape[1]),
                                              np.uint32(IV[i]), U32)
                                     for i in range(8)], axis=0),
                    block, 0, b3.BLOCK_LEN, f))
            if len(nodes) % 2:
                nxt.append(nodes[-1])
            nodes = nxt
        out_ref[:] = nodes[0]

    return kernel


@functools.lru_cache(maxsize=None)
def _hash_call(msg_len_bytes: int, n_cols: int):
    nwords = max(1, (msg_len_bytes + b3.CHUNK_LEN - 1) // b3.CHUNK_LEN) * 256
    C = min(_HASH_TILE, n_cols)
    assert n_cols % C == 0
    return pl.pallas_call(
        _hash_kernel(msg_len_bytes),
        out_shape=jax.ShapeDtypeStruct((8, n_cols), jnp.uint32),
        grid=(n_cols // C,),
        in_specs=[pl.BlockSpec((nwords, C), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, C), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
    )


def hash_columns_auto(comm: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """hash_columns with automatic pallas selection (TPU + tiling fits).

    Column counts that aren't a tile multiple (Brakedown codeword widths
    are irregular, e.g. 178850) hash the aligned prefix in the kernel and
    only the remainder (< 256 columns) on the XLA path."""
    from ..codes.ligero import _use_pallas
    from .blake3_jax import hash_columns
    n_cols = comm.shape[1]
    C = min(_HASH_TILE, n_cols)
    if _use_pallas(max(n_cols, 256)):
        if n_cols % C == 0:
            return hash_columns_pallas(comm, spec)
        main = (n_cols // _HASH_TILE) * _HASH_TILE
        if main >= _HASH_TILE:
            head = hash_columns_pallas(comm[:, :main, :], spec)
            tail = hash_columns(comm[:, main:, :], spec)
            return jnp.concatenate([head, tail], axis=0)
    return hash_columns(comm, spec)


def hash_columns_pallas(comm: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Leaf digests of all columns: (n_rows, n_cols, L) -> (n_cols, 8).

    Bit-identical to ops/blake3_jax.hash_columns."""
    n_rows, n_cols, _ = comm.shape
    words = limbs_to_repr_words(comm, spec)          # (rows, cols, W/4)
    wpr = words.shape[-1]
    colmajor = jnp.transpose(words, (1, 0, 2)).reshape(n_cols, n_rows * wpr)
    colmajor = jnp.transpose(colmajor, (1, 0))       # (row_words, cols)
    zeros = jnp.zeros((8, n_cols), U32)
    msg = jnp.concatenate([zeros, colmajor], axis=0)
    msg_len = 32 + n_rows * spec.repr_bytes
    nwords_pad = max(1, (msg_len + b3.CHUNK_LEN - 1) // b3.CHUNK_LEN) * 256
    if msg.shape[0] < nwords_pad:
        msg = jnp.concatenate(
            [msg, jnp.zeros((nwords_pad - msg.shape[0], n_cols), U32)], axis=0)
    out = _hash_call(msg_len, n_cols)(msg)
    return jnp.transpose(out, (1, 0))                # (n_cols, 8)
