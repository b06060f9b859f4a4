"""Network integration tests: real TCP server in-process on a random port
(reference family: proof-of-storage/src/networking/tests.rs)."""

import asyncio
import random

import pytest

from lcpc_proof_of_storage_tpu.pos import online
from lcpc_proof_of_storage_tpu.pos.database import (CLIENT_METADATA_TABLE,
                                                    MetadataStore)
from lcpc_proof_of_storage_tpu.pos.networking.client import ClientSession
from lcpc_proof_of_storage_tpu.pos.networking.server import serve
from lcpc_proof_of_storage_tpu.pos.online import VerificationError
from lcpc_proof_of_storage_tpu.pos.storage import file_paths


@pytest.fixture()
def run(tmp_path):
    """Run an async client scenario against a fresh in-process server."""
    def _run(scenario):
        async def main():
            server = await serve(0, base=tmp_path,
                                 db_path=str(tmp_path / "server_db"))
            port = server.sockets[0].getsockname()[1]
            db = MetadataStore(tmp_path / "client_db")
            session = await ClientSession.connect(f"127.0.0.1:{port}", db)
            try:
                return await scenario(session, db, tmp_path)
            finally:
                await session.close()
                server.close()
                await server.wait_closed()
        return asyncio.run(main())
    return _run


def _mkfile(tmp_path, n=2000, seed=0, name="data.bin"):
    rnd = random.Random(seed)
    p = tmp_path / name
    data = bytes(rnd.randrange(256) for _ in range(n))
    p.write_bytes(data)
    return p, data


def test_upload_proof_delete(run, tmp_path):
    path, data = _mkfile(tmp_path)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        assert meta.filesize_in_bytes == len(data)
        # metadata persisted client-side
        assert db.get_file_metadata(CLIENT_METADATA_TABLE, meta.id_ulid)
        await session.request_and_verify_proof(meta)
        await session.delete_file(meta)
        assert db.get_file_metadata(CLIENT_METADATA_TABLE, meta.id_ulid) is None
        return meta

    run(scenario)


def test_upload_download_roundtrip(run, tmp_path):
    path, data = _mkfile(tmp_path, n=3333, seed=1)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        downloaded = await session.download_file(meta)
        assert downloaded == data

    run(scenario)


def test_chunked_upload(run, tmp_path):
    path, data = _mkfile(tmp_path, n=200_000, seed=2)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32, use_chunks=True)
        assert meta.filesize_in_bytes == len(data)
        downloaded = await session.download_file(meta)
        assert downloaded == data

    run(scenario)


def test_polynomial_evaluation(run, tmp_path):
    path, _ = _mkfile(tmp_path, n=1500, seed=3)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        await session.request_and_verify_polynomial(meta)

    run(scenario)


def test_reshape(run, tmp_path):
    path, data = _mkfile(tmp_path, n=2000, seed=4)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        new_meta = await session.reshape_file(meta, 16, 64)
        assert new_meta.num_columns == 16
        assert new_meta.num_encoded_columns == 64
        downloaded = await session.download_file(new_meta)
        assert downloaded == data

    run(scenario)


def test_append_with_download_check(run, tmp_path):
    path, data = _mkfile(tmp_path, n=1000, seed=5)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        add = bytes(random.Random(6).randrange(256) for _ in range(137))
        new_meta = await session.append_to_file(meta, add)
        downloaded = await session.download_file(new_meta)
        assert downloaded == data + add
        # second append exercises the partial-coefficient splice path again
        add2 = b"hello world, this is more appended data"
        new_meta2 = await session.append_to_file(new_meta, add2)
        downloaded = await session.download_file(new_meta2)
        assert downloaded == data + add + add2

    run(scenario)


def test_edit_with_spliced_contents(run, tmp_path):
    path, data = _mkfile(tmp_path, n=1800, seed=7)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        replacement = bytes(random.Random(8).randrange(256) for _ in range(100))
        start = 531
        new_meta = await session.edit_file(meta, start, replacement)
        downloaded = await session.download_file(new_meta)
        expect = bytearray(data)
        expect[start : start + len(replacement)] = replacement
        assert downloaded == bytes(expect)

    run(scenario)


def test_server_side_corruption_fails_proof(run, tmp_path):
    """Negative test (networking/tests.rs:696-780): a 2-byte corruption of
    the stored file must fail the next proof."""
    path, data = _mkfile(tmp_path, n=2000, seed=9)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        # corrupt 2 bytes of the server's stored raw file
        raw = file_paths(meta.id_ulid, base)["raw"]
        blob = bytearray(raw.read_bytes())
        blob[100] ^= 0xFF
        blob[101] ^= 0xFF
        raw.write_bytes(bytes(blob))
        with pytest.raises(VerificationError):
            await session.download_file(meta)

    run(scenario)


def test_user_creation_and_login(run, tmp_path):
    from lcpc_proof_of_storage_tpu.pos.networking import shared

    async def scenario(session, db, base):
        r = await session.rpc(shared.new_user("alice", "hunter2"))
        assert r["success"]
        r = await session.rpc(shared.new_user("alice", "hunter2"))
        assert not r["success"]          # duplicate
        r = await session.rpc(shared.user_login("alice", "hunter2"))
        assert r["success"]
        r = await session.rpc(shared.user_login("alice", "wrong"))
        assert not r["success"]
        r = await session.rpc(shared.client_keep_alive())
        assert r["type"] == "ServerKeepAlive"

    run(scenario)


def test_tall_vs_wide_eval_equivalence(run, tmp_path):
    """networking/tests.rs:374-466: same data at two shapes evaluates
    identically (exercised through the reshape accept path)."""
    path, data = _mkfile(tmp_path, n=2500, seed=10)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 4, 32)      # tall
        new_meta = await session.reshape_file(meta, 16, 64)  # wide
        assert new_meta.num_columns == 16
        # reshape_file internally asserts evaluation equality across shapes

    run(scenario)


def test_request_encoded_column(run, tmp_path):
    """RequestEncodedColumn round trip (reference dispatches it at
    server.rs:212 but left the handler unimplemented!()): the returned
    column must equal the commitment's encoded column, verified against the
    root via a single-column proof."""
    path, data = _mkfile(tmp_path, n=2000, seed=11)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        comm = online.commit_file_data(data, 8, 32)
        for col in (0, 5, meta.num_encoded_columns - 1):
            vals = await session.request_encoded_column(meta, col)
            from lcpc_proof_of_storage_tpu.pos.online import POS_FIELD
            from lcpc_proof_of_storage_tpu.fields.field import limbs_to_ints
            import numpy as np
            expect = limbs_to_ints(np.asarray(comm.comm[:, col, :]))
            assert vals == expect
        # out-of-range -> server error
        with pytest.raises(VerificationError, match="out of range"):
            await session.request_encoded_column(
                meta, meta.num_encoded_columns)

    run(scenario)


def test_client_record_round_trip(run, tmp_path):
    """ClientRecord (client_record.rs:7-12): upload stores the hosting
    server; delete removes it; the CLI's server resolution reads it."""
    path, data = _mkfile(tmp_path, n=900, seed=12)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        rec = db.get_client_record(meta.id_ulid)
        assert rec is not None
        assert rec.hosted_on.server_ip == "127.0.0.1"
        assert rec.hosted_on.server_port > 0
        assert rec.metadata.root == meta.root
        assert any(r.id_ulid == meta.id_ulid for r in db.list_client_records())
        await session.delete_file(meta)
        assert db.get_client_record(meta.id_ulid) is None

    run(scenario)


def test_server_files_stored_as_quadruple(run, tmp_path):
    """Upload writes the full on-disk quadruple once; proofs are then
    served from the stored encoded file + tree (no re-commit per request)."""
    path, data = _mkfile(tmp_path, n=2400, seed=13)

    async def scenario(session, db, base):
        meta = await session.upload_file(path, 8, 32)
        paths = file_paths(meta.id_ulid, base)
        for k in ("raw", "enc", "tree", "meta"):
            assert paths[k].is_file(), k
        # deleting the RAW file must not break proof serving (columns come
        # from the stored encoded file)
        paths["raw"].unlink()
        await session.request_and_verify_proof(meta)
        # ...but download (which needs raw) fails cleanly
        with pytest.raises((VerificationError, ConnectionError)):
            await session.download_file(meta)

    run(scenario)
