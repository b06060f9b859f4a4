"""FileHandler: the per-file storage manager (reference:
proof-of-storage/src/lcpc_online/file_handler.rs).

Owns the on-disk quadruple (.porraw/.porenc/.portree/.meta) plus the
in-memory Merkle tree; supports create/attach, edit/append/reshape,
row/column access and full-consistency self-check.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..fields.field import FieldSpec
from .storage import (
    ColumnCVCache, ColumnDigestAccumulator, EncodedFileMetadata,
    EncodedFileReader, EncodedFileWriter, MerkleTree, ceildiv,
    data_bytes_to_limbs_np, file_paths, limbs_to_data_bytes_np, new_ulid,
    _encode_batch,
)


import functools


@functools.lru_cache(maxsize=None)
def _leftmul_step(spec: FieldSpec):
    """acc + t^T . rows as one jitted device step (shapes retrace-cached)."""
    import jax
    import jax.numpy as jnp

    from ..fields.limb import limb_field
    lf = limb_field(spec)
    return jax.jit(lambda acc, m, t: lf.add(acc, lf.dot(m, t[:, None, :],
                                                        axis=0)))


class FileHandler:
    def __init__(self, ulid: str, paths: dict[str, Path], spec: FieldSpec,
                 meta: EncodedFileMetadata, tree: MerkleTree):
        self.ulid = ulid
        self.paths = paths
        self.spec = spec
        self.pre_encoded_size = meta.pre_encoded_size
        self.encoded_size = meta.encoded_size
        self.rows_written = meta.rows_written
        self.row_capacity = meta.row_capacity
        self.total_data_bytes = meta.bytes_of_data
        self.merkle_tree = tree
        self.reader = EncodedFileReader(
            paths["enc"], spec, meta.pre_encoded_size, meta.encoded_size,
            meta.rows_written, meta.row_capacity)
        self._cv_cache: ColumnCVCache | None = None   # built on first edit

    # -- constructors --------------------------------------------------------
    @classmethod
    def attach(cls, ulid: str, spec: FieldSpec, base: Path | None = None) -> "FileHandler":
        paths = file_paths(ulid, base)
        for k, p in paths.items():
            if not p.is_file():
                raise FileNotFoundError(f"missing {k} file: {p}")
        meta = EncodedFileMetadata.read_from_file(paths["meta"])
        assert meta.ulid == ulid, "metadata ulid mismatch"
        tree = MerkleTree.from_bytes(paths["tree"].read_bytes())
        return cls(ulid, paths, spec, meta, tree)

    @classmethod
    def create_from_unencoded_file(cls, ulid: str, source: Path | None,
                                   pre_encoded_size: int, encoded_size: int,
                                   spec: FieldSpec,
                                   base: Path | None = None) -> "FileHandler":
        assert encoded_size & (encoded_size - 1) == 0
        paths = file_paths(ulid, base)
        if source is not None and source != paths["raw"]:
            os.replace(source, paths["raw"])
        meta, tree = EncodedFileWriter.convert_unencoded_file(
            paths["raw"], paths["enc"], paths["tree"], paths["meta"],
            pre_encoded_size, encoded_size, spec, ulid=ulid)
        return cls(ulid, paths, spec, meta, tree)

    @classmethod
    def create_from_bytes(cls, data: bytes, pre_encoded_size: int,
                          encoded_size: int, spec: FieldSpec,
                          base: Path | None = None,
                          ulid: str | None = None) -> "FileHandler":
        ulid = ulid or new_ulid()
        paths = file_paths(ulid, base)
        paths["raw"].write_bytes(data)
        return cls.create_from_unencoded_file(
            ulid, None, pre_encoded_size, encoded_size, spec, base)

    # -- metadata ------------------------------------------------------------
    def get_encoded_metadata(self) -> EncodedFileMetadata:
        return EncodedFileMetadata(
            ulid=self.ulid, pre_encoded_size=self.pre_encoded_size,
            encoded_size=self.encoded_size, rows_written=self.rows_written,
            row_capacity=self.row_capacity, bytes_of_data=self.total_data_bytes)

    def _write_metadata(self) -> None:
        self.get_encoded_metadata().write_to_file(self.paths["meta"])

    def _write_tree(self, tree: MerkleTree) -> None:
        assert len(tree) == self.encoded_size * 2 - 1
        self.paths["tree"].write_bytes(tree.to_bytes())

    @property
    def row_data_bytes(self) -> int:
        return self.pre_encoded_size * self.spec.data_byte_capacity

    def get_dimensions(self) -> tuple[int, int, int]:
        return (self.pre_encoded_size, self.encoded_size, self.rows_written)

    def get_commit_root(self) -> bytes:
        return self.merkle_tree.root()

    # -- mutation ------------------------------------------------------------
    def edit_bytes(self, byte_start: int, new_bytes: bytes) -> tuple[bytes, MerkleTree]:
        """file_handler.rs:279-333: returns (original bytes, new tree)."""
        assert byte_start + len(new_bytes) <= self.total_data_bytes, \
            "can't edit more bytes than there are in the file"
        with open(self.paths["raw"], "r+b") as f:
            f.seek(byte_start)
            original = f.read(len(new_bytes))
            f.seek(byte_start)
            f.write(new_bytes)
        start_row = byte_start // self.row_data_bytes
        end_row = ceildiv(byte_start + len(new_bytes), self.row_data_bytes)
        with open(self.paths["raw"], "rb") as f:
            for row in range(start_row, end_row):
                f.seek(row * self.row_data_bytes)
                row_bytes = f.read(self.row_data_bytes)
                self.reader.replace_row_with_decoded_bytes(row, row_bytes)
        self.reader.flush()
        cache = self._cv_cache_ready()
        cache.note_rows_changed(start_row, end_row)
        tree = self._tree_from_cache(cache)
        return original, tree

    def append_bytes(self, data: bytes) -> MerkleTree:
        """file_handler.rs:335-366."""
        with open(self.paths["raw"], "ab") as f:
            f.write(data)
        start_row = self.total_data_bytes // self.row_data_bytes
        end_row = ceildiv(self.total_data_bytes + len(data), self.row_data_bytes)
        cache = self._cv_cache_ready()
        if end_row > self.row_capacity:
            self.reader.set_new_capacity(end_row * 2)
            self.row_capacity = end_row * 2
            cache.set_row_capacity(self.row_capacity)
        self.total_data_bytes += len(data)
        self.rows_written = end_row
        self.reader.rows_written = end_row
        with open(self.paths["raw"], "rb") as f:
            for row in range(start_row, end_row):
                f.seek(row * self.row_data_bytes)
                row_bytes = f.read(self.row_data_bytes)
                self.reader.replace_encoded_row(row, self._encode_row_bytes(row_bytes))
        # rewritten last partial row + newly-completed full chunks
        self.reader.flush()
        cache.set_rows_written(end_row)
        cache.note_rows_changed(start_row, end_row)
        tree = self._tree_from_cache(cache)
        self._write_metadata()
        return tree

    def _encode_row_bytes(self, row_bytes: bytes) -> np.ndarray:
        limbs = data_bytes_to_limbs_np(row_bytes, self.spec)
        mat = np.zeros((1, self.pre_encoded_size, self.spec.num_limbs16), np.uint32)
        mat[0, : limbs.shape[0]] = limbs
        return np.asarray(_encode_batch(self.spec, self.encoded_size)(mat))[0]

    def reshape(self, new_pre: int, new_enc: int) -> tuple[EncodedFileMetadata, MerkleTree]:
        """file_handler.rs:224-276: re-encode from the raw file at new dims."""
        self.reader.close()
        meta, tree = EncodedFileWriter.convert_unencoded_file(
            self.paths["raw"], self.paths["enc"], self.paths["tree"],
            self.paths["meta"], new_pre, new_enc, self.spec, ulid=self.ulid)
        self.pre_encoded_size = new_pre
        self.encoded_size = new_enc
        self.rows_written = meta.rows_written
        self.row_capacity = meta.row_capacity
        self.total_data_bytes = meta.bytes_of_data
        self.merkle_tree = tree
        self.reader = EncodedFileReader(
            self.paths["enc"], self.spec, new_pre, new_enc,
            meta.rows_written, meta.row_capacity)
        self._cv_cache = None                 # dims changed: rebuild lazily
        return meta, tree

    def _cv_cache_ready(self) -> ColumnCVCache:
        """Chunk-CV cache for incremental re-hash; built once (one full
        pass), then every edit/append re-hashes only touched chunks —
        the reference re-hashes the whole file per edit
        (file_handler.rs:331, 474-481)."""
        if self._cv_cache is None:
            self._cv_cache = ColumnCVCache(
                self.paths["enc"], self.spec, self.encoded_size,
                self.row_capacity, self.rows_written)
        return self._cv_cache

    def _tree_from_cache(self, cache: ColumnCVCache) -> MerkleTree:
        tree = cache.to_merkle_tree()
        self.merkle_tree = tree
        self._write_tree(tree)
        return tree

    def recalculate_merkle_tree(self) -> MerkleTree:
        tree = self.reader.process_file_to_merkle_tree()
        self.merkle_tree = tree
        self._write_tree(tree)
        return tree

    # -- access --------------------------------------------------------------
    def get_encoded_row(self, row: int) -> np.ndarray:
        return self.reader.get_encoded_row(row)

    def get_decoded_row_bytes(self, row: int) -> bytes:
        return self.reader.get_unencoded_row_bytes(row)

    def get_unencoded_row(self, row: int) -> bytes:
        assert row < self.rows_written
        start = row * self.row_data_bytes
        end = min((row + 1) * self.row_data_bytes, self.total_data_bytes)
        return self.get_unencoded_bytes(start, end)

    def get_unencoded_bytes(self, start: int, end: int) -> bytes:
        with open(self.paths["raw"], "rb") as f:
            f.seek(start)
            return f.read(end - start)

    def read_only_digests(self, columns: list[int] | None = None) -> list[bytes]:
        cols = columns if columns is not None else list(range(self.encoded_size))
        return [self.merkle_tree[c] for c in cols]

    def read_full_columns(self, columns: list[int] | None = None):
        from ..core.commit import LcColumn
        from ..fields.field import limbs_to_ints
        cols = columns if columns is not None else list(range(self.encoded_size))
        out = []
        for c in cols:
            vals = limbs_to_ints(self.reader.get_encoded_column_without_path(c))
            out.append(LcColumn(col=vals, path=self.merkle_tree.get_path(c)))
        return out

    def left_multiply_unencoded_matrix_by_vector(self, left: list[int]) -> list[int]:
        """v = left^T . unencoded matrix (file_handler.rs:614-638).

        The reference parallelizes this with rayon; here the raw file is
        read in row batches and each batch runs one batched limb-field dot
        on device, folding into a (n_pre, L) accumulator — the same kernel
        the commit-time collapses use (fields/limb.py dot)."""
        assert len(left) == self.rows_written
        import jax.numpy as jnp

        from ..fields.field import ints_to_limbs, limbs_to_ints
        from ..fields.limb import limb_field

        lf = limb_field(self.spec)
        n_pre = self.pre_encoded_size
        t_mat = ints_to_limbs(left, self.spec)            # (rows, L)
        step = _leftmul_step(self.spec)
        # ~64 MB of raw bytes per batch keeps the widened dot transient small
        rows_b = max(1, min(self.rows_written,
                            (64 << 20) // max(self.row_data_bytes, 1)))
        acc = lf.zeros((n_pre,))
        with open(self.paths["raw"], "rb") as f:
            for r0 in range(0, self.rows_written, rows_b):
                r1 = min(r0 + rows_b, self.rows_written)
                f.seek(r0 * self.row_data_bytes)
                chunk = f.read(min(r1 * self.row_data_bytes,
                                   self.total_data_bytes)
                               - r0 * self.row_data_bytes)
                limbs = data_bytes_to_limbs_np(chunk, self.spec)
                mat = np.zeros(((r1 - r0) * n_pre, limbs.shape[1]), np.uint32)
                mat[: limbs.shape[0]] = limbs
                acc = step(acc, jnp.asarray(mat.reshape(r1 - r0, n_pre, -1)),
                           jnp.asarray(t_mat[r0:r1]))
        return limbs_to_ints(np.asarray(acc))

    def verifiable_polynomial_evaluation(self, left: list[int]) -> list[int]:
        """v = left^T . ENCODED matrix (lcpc_online.rs:454-484) served from
        the raw file: encode is row-wise linear, so
        left^T . encode(M) == encode(left^T . M) — one batched left-multiply
        over the unencoded rows plus a single-row encode, instead of the
        reference's full re-commit per evaluation request
        (server.rs:670-683 re-reads + re-encodes the whole file)."""
        from ..fields.field import ints_to_limbs, limbs_to_ints

        u = self.left_multiply_unencoded_matrix_by_vector(left)
        mat = np.zeros((1, self.pre_encoded_size, self.spec.num_limbs16),
                       np.uint32)
        mat[0] = ints_to_limbs(u, self.spec)
        enc_row = np.asarray(
            _encode_batch(self.spec, self.encoded_size)(mat))[0]
        return limbs_to_ints(enc_row)

    def verify_all_files_agree(self) -> None:
        """Exhaustive self-check (file_handler.rs:505-541)."""
        tree_from_encoded = self.reader.process_file_to_merkle_tree()
        assert tree_from_encoded == self.merkle_tree, "encoded file tree mismatch"
        # re-encode the raw file and compare digests
        acc = ColumnDigestAccumulator(self.encoded_size, self.spec)
        total = 0
        with open(self.paths["raw"], "rb") as f:
            while True:
                row_bytes = f.read(self.row_data_bytes)
                if not row_bytes:
                    break
                total += len(row_bytes)
                acc.update_batch(self._encode_row_bytes(row_bytes)[None])
        assert total == self.total_data_bytes, "raw size mismatch"
        assert acc.finalize_to_merkle_tree() == self.merkle_tree, \
            "raw-file re-encode tree mismatch"

    def clone_to_new_ulid(self, base: Path | None = None) -> "FileHandler":
        """Duplicate the on-disk quadruple under a fresh ulid and return a
        handler attached to the copy.  The reference declares this surface
        but never finished it (file_handler.rs:209 todo!()); semantics here:
        byte-identical raw/enc/tree copies, metadata rewritten with the new
        ulid (it is embedded in the JSON)."""
        import shutil

        from .storage import file_paths, new_ulid
        ulid = new_ulid()
        if base is None:
            base = self.paths["raw"].parent.parent
        dst = file_paths(ulid, base)
        for key in ("raw", "enc", "tree"):
            shutil.copyfile(self.paths[key], dst[key])
        meta = self.get_encoded_metadata()
        meta.ulid = ulid
        meta.write_to_file(dst["meta"])
        return FileHandler.attach(ulid, self.spec, base=base)

    def clone_reshaped(self, new_pre: int, new_enc: int,
                       base: Path | None = None):
        """Reshape into a NEW ulid: copy only the raw file and re-encode at
        the new dims.  A full clone_to_new_ulid + reshape() pays a wasted
        read+write of the encoded file and tree — the largest artifacts —
        only for reshape() to regenerate both from raw.  Returns
        (handler attached to the new quadruple, its MerkleTree)."""
        import shutil

        from .storage import EncodedFileWriter, file_paths, new_ulid
        ulid = new_ulid()
        if base is None:
            base = self.paths["raw"].parent.parent
        dst = file_paths(ulid, base)
        shutil.copyfile(self.paths["raw"], dst["raw"])
        _, tree = EncodedFileWriter.convert_unencoded_file(
            dst["raw"], dst["enc"], dst["tree"], dst["meta"],
            new_pre, new_enc, self.spec, ulid=ulid)
        return FileHandler.attach(ulid, self.spec, base=base), tree

    def delete_all_files(self) -> None:
        self.reader.close()
        for p in self.paths.values():
            if p.exists():
                p.unlink()
        parent = self.paths["raw"].parent
        if parent.exists() and not any(parent.iterdir()):
            parent.rmdir()
