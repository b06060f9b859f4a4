"""Proof-serving latency vs stored-file size.

The reference re-reads + re-commits the WHOLE file per proof request
(server.rs:670-683 does this deliberately), so its serving latency is
linear in file size.  This server answers RequestProof / RequestPolyEval /
RequestEncodedColumn from the stored .porenc/.portree quadruple
(pos/networking/server.py), so serving should be ~flat in file size.

Run (CPU is fine — the served columns come off disk, not the TPU):
  PYTHONPATH=/root/repo python scripts/bench_serving.py [sizes_kb...]
Prints one JSON line per size: upload once, then the median of 5
RequestProof round trips.
"""

import asyncio
import json
import os
import random
import statistics
import sys
import tempfile
import time
from pathlib import Path


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from lcpc_proof_of_storage_tpu.pos.database import MetadataStore
    from lcpc_proof_of_storage_tpu.pos.networking.client import ClientSession
    from lcpc_proof_of_storage_tpu.pos.networking.server import serve

    sizes_kb = [int(s) for s in sys.argv[1:]] or [64, 512, 4096]

    async def run():
        with tempfile.TemporaryDirectory() as td:
            base = Path(td)
            server = await serve(0, base=base, db_path=str(base / "srv_db"))
            port = server.sockets[0].getsockname()[1]
            db = MetadataStore(base / "cli_db")
            session = await ClientSession.connect(f"127.0.0.1:{port}", db)
            try:
                rnd = random.Random(0)
                for kb in sizes_kb:
                    p = base / f"f{kb}.bin"
                    p.write_bytes(bytes(rnd.getrandbits(8)
                                        for _ in range(kb * 1024)))
                    meta = await session.upload_file(p)
                    # warm once (server opens the stored quadruple)
                    await session.request_and_verify_proof(meta)
                    ts = []
                    for _ in range(5):
                        t0 = time.time()
                        await session.request_and_verify_proof(meta)
                        ts.append(time.time() - t0)
                    print(json.dumps({
                        "file_kb": kb,
                        "proof_rtt_median_s": round(statistics.median(ts), 4),
                        "proof_rtt_min_s": round(min(ts), 4),
                    }), flush=True)
            finally:
                await session.close()
                server.close()
                await server.wait_closed()

    asyncio.run(run())


if __name__ == "__main__":
    main()
