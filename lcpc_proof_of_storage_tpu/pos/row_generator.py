"""Streaming encoded-row generator (reference:
proof-of-storage/src/lcpc_online/row_generator_iter.rs).

Wraps a field-element iterator into encoded rows, with one-pass streaming
column digests / commitment root / full column openings — the "iterator
pipeline == in-RAM commit" oracle family (row_generator_iter.rs:188-364).
Rows are encoded in device batches rather than one NTT per row.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

from ..fields.field import FieldSpec, ints_to_limbs
from .storage import ColumnDigestAccumulator, MerkleTree, _encode_batch


class RowGenerator:
    """Iterates encoded rows from a stream of field element values."""

    BATCH = 128

    def __init__(self, values: Iterable[int], n_per_row: int, n_cols: int,
                 spec: FieldSpec):
        self.values = iter(values)
        self.n_per_row = n_per_row
        self.n_cols = n_cols
        self.spec = spec

    def __iter__(self) -> Iterator[np.ndarray]:
        """Yields (n_cols, L) encoded rows, zero-padding the final row."""
        L = self.spec.num_limbs16
        enc = _encode_batch(self.spec, self.n_cols)
        buf: list[int] = []
        done = False
        while not done:
            target = self.n_per_row * self.BATCH
            while len(buf) < target:
                try:
                    buf.append(next(self.values))
                except StopIteration:
                    done = True
                    break
            if not buf:
                return
            rows = -(-len(buf) // self.n_per_row)
            rows_p = 1 if rows <= 1 else 1 << (rows - 1).bit_length()
            mat = np.zeros((rows_p, self.n_per_row, L), np.uint32)
            limbs = ints_to_limbs(buf, self.spec)
            mat.reshape(-1, L)[: len(buf)] = limbs
            encoded = np.asarray(enc(mat))[:rows]
            buf = []
            for i in range(rows):
                yield encoded[i]

    # -- one-pass consumers (row_generator_iter.rs API) ---------------------
    def get_column_digests(self) -> list[bytes]:
        acc = ColumnDigestAccumulator(self.n_cols, self.spec)
        for row in self:
            acc.update(row)
        return acc.get_column_digests()

    def get_specified_column_digests(self, columns: list[int]) -> list[bytes]:
        acc = ColumnDigestAccumulator(self.n_cols, self.spec, columns=columns)
        for row in self:
            acc.update(row)
        return acc.get_column_digests()

    def convert_to_commit_root(self) -> bytes:
        return MerkleTree.new(self.get_column_digests()).root()

    def get_full_columns(self, columns: list[int]):
        from ..core.commit import LcColumn
        from ..fields.field import limbs_to_ints
        acc = ColumnDigestAccumulator(self.n_cols, self.spec)
        col_vals: list[list[int]] = [[] for _ in columns]
        for row in self:
            acc.update(row)
            vals = limbs_to_ints(row[columns, :])
            for k, v in enumerate(vals):
                col_vals[k].append(v)
        tree = acc.finalize_to_merkle_tree()
        return [LcColumn(col=col_vals[k], path=tree.get_path(c))
                for k, c in enumerate(columns)]
