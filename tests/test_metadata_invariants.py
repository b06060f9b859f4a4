"""Long mixed-op metadata invariant fuzz — the reference's
test_metadata_is_correct (proof-of-storage/src/lcpc_online/tests.rs:558-651):
a random interleaving of appends and reshapes with after-every-op invariant
checks (sizes, row accounting, on-disk agreement).

Default 50 ops for CI; LCPC_BIG_FUZZ=1 runs the reference's 500.
"""

import os
import random

from lcpc_proof_of_storage_tpu.pos.file_handler import FileHandler
from lcpc_proof_of_storage_tpu.pos.online import POS_FIELD

BIG_FUZZ = os.environ.get("LCPC_BIG_FUZZ", "") not in ("", "0")
RANDOM_LENGTH = 64


def test_metadata_is_correct(tmp_path):
    rnd = random.Random(558651)
    spec = POS_FIELD
    cap = spec.data_byte_capacity
    original_len = 700
    data = bytes(rnd.randrange(256) for _ in range(original_len))
    pre, enc = 8, 16
    fh = FileHandler.create_from_bytes(data, pre, enc, spec, base=tmp_path)
    fh.verify_all_files_agree()

    ops = 500 if BIG_FUZZ else 50
    for i in range(ops):
        meta = fh.get_encoded_metadata()

        if i % 10 == 0:
            # random new shape (reference: pre in [2, file_len),
            # enc = next_power_of_two(pre + 1)) — keep pre sane for runtime
            pre = rnd.randrange(2, min(original_len, 64))
            enc = 1 << (pre + 1 - 1).bit_length()
            if enc <= pre:
                enc = 2 * enc
            fh.reshape(pre, enc)
            new = fh.get_encoded_metadata()
            assert new.pre_encoded_size == pre
            assert new.encoded_size == enc
            assert new.bytes_of_data == original_len
            assert new.bytes_of_data == meta.bytes_of_data
            assert new.rows_written * 2 == new.row_capacity
            assert new.rows_written == -(-original_len // (pre * cap))
            meta = new

        add = bytes(rnd.randrange(256) for _ in range(RANDOM_LENGTH))
        fh.append_bytes(add)
        original_len += RANDOM_LENGTH
        new = fh.get_encoded_metadata()
        assert new.bytes_of_data == original_len
        assert new.ulid == fh.ulid
        assert new.rows_written <= new.row_capacity
        assert meta.rows_written <= new.rows_written
        assert meta.row_capacity <= new.row_capacity
        fh.verify_all_files_agree()

    fh.delete_all_files()


def test_clone_to_new_ulid(tmp_path):
    rnd = random.Random(7)
    data = bytes(rnd.randrange(256) for _ in range(900))
    fh = FileHandler.create_from_bytes(data, 8, 16, POS_FIELD, base=tmp_path)
    clone = fh.clone_to_new_ulid()
    assert clone.ulid != fh.ulid
    assert clone.merkle_tree.root() == fh.merkle_tree.root()
    assert clone.get_encoded_metadata().ulid == clone.ulid
    clone.verify_all_files_agree()
    # divergence after clone: editing the clone leaves the original intact
    clone.edit_bytes(10, b"\xff" * 20)
    assert clone.merkle_tree.root() != fh.merkle_tree.root()
    fh.verify_all_files_agree()
