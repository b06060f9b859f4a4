"""PoR server: asyncio TCP, one handler task per connection.

Re-creation of proof-of-storage/src/networking/server.rs: request/response
in lockstep over a length-delimited JSON stream; every handler error turns
into an ErrorResponse instead of dropping the connection (server.rs:267-277).

Two intentional deviations from reference bugs (documented):
  * chunked upload is fully implemented (reference left todo!() at
    server.rs:456) using the streaming EncodedFileWriter;
  * accept/reject file shuffling uses the intended transactional semantics:
    accepted edits/appends keep the NEW file and drop the old; rejected ones
    drop the NEW file (the reference renames/deletes the wrong side,
    server.rs:1109-1131).
"""

from __future__ import annotations

import asyncio
import traceback
from pathlib import Path

from ...fields.field import FieldSpec, limbs_to_ints
from ..database import (FileMetadata, MetadataStore, SERVER_METADATA_TABLE,
                        ServerHost)
from .. import online
from ..online import POS_FIELD
from ..storage import (EncodedFileWriter, ceildiv, data_bytes_to_limbs_np,
                       file_paths, new_ulid)
from . import shared


class ServerState:
    def __init__(self, base: Path | None = None, db_path: str | None = None):
        self.base = base
        self.db = MetadataStore(db_path or (str(base / "PoR_Database")
                                            if base else "PoR_Database"))
        self.open_files: dict[str, EncodedFileWriter] = {}
        self.open_file_info: dict[str, tuple[str, int, int]] = {}


def _raw_path(state: ServerState, meta: FileMetadata) -> Path:
    return file_paths(meta.id_ulid, state.base)["raw"]


def _read_raw(state: ServerState, meta: FileMetadata) -> bytes:
    return _raw_path(state, meta).read_bytes()


def _commit_from_meta(state: ServerState, meta: FileMetadata):
    data = _read_raw(state, meta)
    return online.commit_file_data(
        data, meta.num_columns, meta.num_encoded_columns, POS_FIELD), data


async def handle_connection(state: ServerState, reader, writer) -> None:
    try:
        while True:
            msg = await shared.recv_msg(reader)
            if msg is None:
                break
            try:
                reply = await dispatch(state, msg)
            except Exception as exc:      # ErrorResponse on any handler error
                traceback.print_exc()
                reply = shared.error_response(str(exc))
            if reply is not None:
                await shared.send_msg(writer, reply)
    finally:
        writer.close()


async def dispatch(state: ServerState, msg: dict) -> dict | None:
    t = msg.get("type")
    handlers = {
        "NewUser": h_new_user,
        "UserLogin": h_user_login,
        "UploadNewFile": h_upload_new_file,
        "StartUploadNewFileByChunks": h_start_chunked,
        "UploadFileChunk": h_upload_chunk,
        "RequestFile": h_request_file,
        "RequestFileRow": h_request_file_row,
        "EditFileBytes": h_edit_file_bytes,
        "AppendToFile": h_append_to_file,
        "RequestProof": h_request_proof,
        "RequestPolynomialEvaluation": h_request_poly_eval,
        "RequestFileReshape": h_request_reshape,
        "RequestReshapeEvaluation": h_request_reshape_eval,
        "ReshapeResponse": h_reshape_response,
        "RequestAppendEvaluation": h_request_append_eval,
        "RequestEditEvaluation": h_request_edit_eval,
        "EditOrAppendResponse": h_edit_or_append_response,
        "DeleteFile": h_delete_file,
        "ClientKeepAlive": lambda s, m: _keepalive(),
    }
    handler = handlers.get(t)
    if handler is None:
        return shared.error_response(f"unknown message type {t}")
    result = handler(state, msg)
    if asyncio.iscoroutine(result):
        result = await result
    return result


async def _keepalive():
    return shared.server_keep_alive()


def h_new_user(state, msg):
    ok = state.db.create_user(msg["username"], msg["password"])
    return shared.user_login_response(ok)


def h_user_login(state, msg):
    return shared.user_login_response(
        state.db.check_login(msg["username"], msg["password"]))


def h_upload_new_file(state, msg):
    """server.rs:341-413."""
    data = bytes.fromhex(msg["file"])
    n_pre, n_enc = msg["columns"], msg["encoded_columns"]
    if not online.dims_ok(n_pre, n_enc):
        return shared.error_response("Invalid rows or columns")
    comm = online.commit_file_data(data, n_pre, n_enc, POS_FIELD)
    ulid = new_ulid()
    file_paths(ulid, state.base)["raw"].write_bytes(data)
    meta = FileMetadata(
        id_ulid=ulid, filename=msg["filename"], num_rows=comm.n_rows,
        num_columns=n_pre, num_encoded_columns=n_enc,
        filesize_in_bytes=len(data), stored_server=ServerHost(),
        root=comm.get_root().root)
    state.db.put_file_metadata(SERVER_METADATA_TABLE, meta)
    return shared.compact_commit(meta)


def h_start_chunked(state, msg):
    """server.rs:416-443 + proper implementation of the todo!()."""
    ulid = new_ulid()
    paths = file_paths(ulid, state.base)
    n_pre, n_enc = msg["columns"], msg["encoded_columns"]
    if not online.dims_ok(n_pre, n_enc):
        return shared.error_response("Invalid rows or columns")
    writer = EncodedFileWriter(n_pre, n_enc, msg["total_file_size"],
                               paths["enc"], POS_FIELD)
    paths["raw"].write_bytes(b"")
    state.open_files[ulid] = writer
    state.open_file_info[ulid] = (msg["filename"], n_pre, n_enc)
    return shared.uploading_file_chunk_identifier(ulid)


def h_upload_chunk(state, msg):
    ulid = msg["file_ulid"]
    writer = state.open_files.get(ulid)
    if writer is None:
        return shared.error_response(
            "File does not exist, start a chunked upload first")
    chunk = bytes.fromhex(msg["chunk"])
    with open(file_paths(ulid, state.base)["raw"], "ab") as f:
        f.write(chunk)
    writer.push_bytes(chunk)
    if not msg["last_chunk"]:
        return shared.uploading_file_chunk_response(True)
    # finalize: tree + metadata + db entry + CompactCommit
    filename, n_pre, n_enc = state.open_file_info.pop(ulid)
    meta_enc, tree = writer.finalize_to_merkle_tree()
    meta_enc.ulid = ulid
    paths = file_paths(ulid, state.base)
    paths["tree"].write_bytes(tree.to_bytes())
    meta_enc.write_to_file(paths["meta"])
    del state.open_files[ulid]
    meta = FileMetadata(
        id_ulid=ulid, filename=filename,
        num_rows=meta_enc.rows_written, num_columns=n_pre,
        num_encoded_columns=n_enc, filesize_in_bytes=meta_enc.bytes_of_data,
        stored_server=ServerHost(), root=tree.root())
    state.db.put_file_metadata(SERVER_METADATA_TABLE, meta)
    return shared.compact_commit(meta)


def h_request_file(state, msg):
    meta = shared.parse_metadata(msg["file_metadata"])
    return shared.file_msg(_read_raw(state, meta))


def h_request_file_row(state, msg):
    meta = shared.parse_metadata(msg["file_metadata"])
    row = msg["row"]
    row_bytes = meta.num_columns * POS_FIELD.data_byte_capacity
    data = _read_raw(state, meta)
    return shared.file_row_msg(data[row * row_bytes : (row + 1) * row_bytes])


def h_edit_file_bytes(state, msg):
    """server.rs:497-565: copy to new ulid, apply edit, commit both kept."""
    meta = shared.parse_metadata(msg["file_metadata"])
    start = msg["start_byte"]
    replacement = bytes.fromhex(msg["replacement_bytes"])
    data = bytearray(_read_raw(state, meta))
    if start + len(replacement) > len(data):
        return shared.error_response("edit out of bounds")
    data[start : start + len(replacement)] = replacement
    new_id = new_ulid()
    file_paths(new_id, state.base)["raw"].write_bytes(bytes(data))
    comm = online.commit_file_data(bytes(data), meta.num_columns,
                                   meta.num_encoded_columns, POS_FIELD)
    new_meta = FileMetadata(
        id_ulid=new_id, filename=meta.filename, num_rows=comm.n_rows,
        num_columns=meta.num_columns,
        num_encoded_columns=meta.num_encoded_columns,
        filesize_in_bytes=len(data), stored_server=meta.stored_server,
        root=comm.get_root().root)
    state.db.put_file_metadata(SERVER_METADATA_TABLE, new_meta)
    return shared.compact_commit(new_meta)


def h_append_to_file(state, msg):
    """server.rs:568-636."""
    meta = shared.parse_metadata(msg["file_metadata"])
    add = bytes.fromhex(msg["append_data"])
    data = _read_raw(state, meta) + add
    new_id = new_ulid()
    file_paths(new_id, state.base)["raw"].write_bytes(data)
    comm = online.commit_file_data(data, meta.num_columns,
                                   meta.num_encoded_columns, POS_FIELD)
    new_meta = FileMetadata(
        id_ulid=new_id, filename=meta.filename, num_rows=comm.n_rows,
        num_columns=meta.num_columns,
        num_encoded_columns=meta.num_encoded_columns,
        filesize_in_bytes=len(data), stored_server=meta.stored_server,
        root=comm.get_root().root)
    state.db.put_file_metadata(SERVER_METADATA_TABLE, new_meta)
    return shared.compact_commit(new_meta)


def h_request_proof(state, msg):
    """server.rs:652-693: full re-commit, open columns with paths."""
    meta = shared.parse_metadata(msg["file_metadata"])
    requested = msg["columns_to_verify"]
    comm, _ = _commit_from_meta(state, meta)
    columns = online.server_retrieve_columns(comm, requested)
    return shared.columns_msg(columns)


def h_request_poly_eval(state, msg):
    """server.rs:696-737: v = L^T M with left stride x^(i*n_cols)."""
    meta = shared.parse_metadata(msg["file_metadata"])
    point = int(msg["evaluation_point"])
    comm, _ = _commit_from_meta(state, meta)
    left, _ = online.form_side_vectors(point, comm.n_rows, comm.n_cols, POS_FIELD)
    v = online.verifiable_polynomial_evaluation(comm, left, POS_FIELD)
    return shared.polynomial_evaluation_msg(v)


def h_request_reshape(state, msg):
    """server.rs:794-831: commit the same data at new dims, NEW ulid."""
    meta = shared.parse_metadata(msg["file_metadata"])
    new_pre = msg["new_pre_encoded_columns"]
    new_enc = msg["new_encoded_columns"]
    data = _read_raw(state, meta)
    comm = online.commit_file_data(data, new_pre, new_enc, POS_FIELD)
    new_meta = FileMetadata(
        id_ulid=new_ulid(), filename=meta.filename, num_rows=comm.n_rows,
        num_columns=new_pre, num_encoded_columns=new_enc,
        filesize_in_bytes=meta.filesize_in_bytes,
        stored_server=meta.stored_server, root=comm.get_root().root)
    state.db.put_file_metadata(SERVER_METADATA_TABLE, new_meta)
    return shared.compact_commit(new_meta)


def _eval_commit(state, meta, point, cols, data=None):
    if data is None:
        data = _read_raw(state, meta)
    comm = online.commit_file_data(
        data, meta.num_columns, meta.num_encoded_columns, POS_FIELD)
    left, _ = online.form_side_vectors(point, comm.n_rows, comm.n_per_row, POS_FIELD)
    v = online.verifiable_polynomial_evaluation(comm, left, POS_FIELD)
    columns = online.server_retrieve_columns(comm, cols)
    return comm, v, columns, data


def h_request_reshape_eval(state, msg):
    """server.rs:834-906: both shapes of the same (old-ulid) data."""
    old_meta = shared.parse_metadata(msg["old_file_metadata"])
    new_meta = shared.parse_metadata(msg["new_file_metadata"])
    point = int(msg["evaluation_point"])
    data = _read_raw(state, old_meta)
    _, old_v, old_cols, _ = _eval_commit(
        state, old_meta, point, msg["columns_to_expand_original"], data)
    _, new_v, new_cols, _ = _eval_commit(
        state, new_meta, point, msg["columns_to_expand_new"], data)
    vals = limbs_to_ints(data_bytes_to_limbs_np(data, POS_FIELD))
    expected = online.evaluate_field_polynomial_at_point(vals, point, POS_FIELD)
    return shared.reshape_evaluation_msg(expected, old_v, old_cols, new_v, new_cols)


def h_reshape_response(state, msg):
    """server.rs:909-960 (intended semantics on reject)."""
    old_meta = shared.parse_metadata(msg["old_file_metadata"])
    new_meta = shared.parse_metadata(msg["new_file_metadata"])
    old_raw = file_paths(old_meta.id_ulid, state.base)["raw"]
    new_raw = file_paths(new_meta.id_ulid, state.base)["raw"]
    if msg["accepted"]:
        old_raw.rename(new_raw)
        state.db.delete(SERVER_METADATA_TABLE, old_meta.id_ulid)
        result = new_meta
    else:
        state.db.delete(SERVER_METADATA_TABLE, new_meta.id_ulid)
        result = old_meta
    return shared.compact_commit(result)


def h_request_append_eval(state, msg):
    """server.rs:963-1055, append branch."""
    old_meta = shared.parse_metadata(msg["old_file_metadata"])
    new_meta = shared.parse_metadata(msg["new_file_metadata"])
    point = int(msg["evaluation_point"])
    cols = msg["columns_to_expand"]
    _, old_v, old_cols, _ = _eval_commit(state, old_meta, point, cols)
    _, new_v, new_cols, new_data = _eval_commit(state, new_meta, point, cols)
    new_vals = limbs_to_ints(data_bytes_to_limbs_np(new_data, POS_FIELD))
    start = (old_meta.num_rows - 1) * old_meta.num_columns
    if old_meta.num_rows < new_meta.num_rows:
        end = old_meta.num_rows * old_meta.num_columns - 1
    else:
        # reference divides by CAPACITY bits instead of bytes here
        # (server.rs:1040, a bug); use the working bound: the whole last row
        end = min(len(new_vals), start + old_meta.num_columns) - 1
    edited_row = new_vals[start : end + 1]
    return shared.append_evaluation_msg(old_v, old_cols, new_v, new_cols, edited_row)


def h_request_edit_eval(state, msg):
    """server.rs:963-1080, edit branch."""
    old_meta = shared.parse_metadata(msg["old_file_metadata"])
    new_meta = shared.parse_metadata(msg["new_file_metadata"])
    point = int(msg["evaluation_point"])
    cols = msg["columns_to_expand"]
    start, finish = msg["requested_unencoded_row_range_inclusive"]
    _, old_v, old_cols, old_data = _eval_commit(state, old_meta, point, cols)
    _, new_v, new_cols, _ = _eval_commit(state, new_meta, point, cols)
    cap = POS_FIELD.data_byte_capacity
    start_b = start * old_meta.num_columns * cap
    end_b = min((finish + 1) * old_meta.num_columns * cap - 1, len(old_data))
    original_rows = old_data[start_b : end_b + 1]
    return shared.edit_evaluation_msg(old_v, old_cols, new_v, new_cols, original_rows)


def h_edit_or_append_response(state, msg):
    """server.rs:1080-1136 with intended transactional semantics."""
    old_meta = shared.parse_metadata(msg["old_file_metadata"])
    new_meta = shared.parse_metadata(msg["new_file_metadata"])
    old_raw = file_paths(old_meta.id_ulid, state.base)["raw"]
    new_raw = file_paths(new_meta.id_ulid, state.base)["raw"]
    if msg["accepted"]:
        if old_raw.exists():
            old_raw.unlink()
        state.db.delete(SERVER_METADATA_TABLE, old_meta.id_ulid)
        result = new_meta
    else:
        if new_raw.exists():
            new_raw.unlink()
        state.db.delete(SERVER_METADATA_TABLE, new_meta.id_ulid)
        result = old_meta
    return shared.compact_commit(result)


def h_delete_file(state, msg):
    """server.rs:740-791."""
    meta = shared.parse_metadata(msg["file_metadata"])
    raw = file_paths(meta.id_ulid, state.base)["raw"]
    if raw.exists():
        raw.unlink()
    state.db.delete(SERVER_METADATA_TABLE, meta.id_ulid)
    return shared.file_deleted(meta.filename)


async def serve(port: int, base: Path | None = None,
                db_path: str | None = None) -> asyncio.AbstractServer:
    """server_main (server.rs:83-109): bind 0.0.0.0:port, task per conn."""
    state = ServerState(base=base, db_path=db_path)

    async def on_conn(reader, writer):
        await handle_connection(state, reader, writer)

    server = await asyncio.start_server(on_conn, "0.0.0.0", port)
    return server


def server_main(port: int, base: Path | None = None) -> None:
    async def run():
        server = await serve(port, base)
        async with server:
            await server.serve_forever()

    asyncio.run(run())
