"""Persistent TPU measurement worker (round 4).

The axon tunnel costs 1-15 min of session warmup per PROCESS, which makes
iterative kernel measurement (edit -> measure -> edit) prohibitively slow as
one-process-per-run.  This worker warms the chip ONCE and then executes job
files submitted to a spool directory, so each measurement costs only its own
device time.

Protocol (spool dir /tmp/lcpc_r4_jobs by default):
  - submit:   write <name>.py into the spool dir (atomic: write .tmp, rename)
  - worker:   picks jobs in sorted order, execs each in a fresh namespace,
              writes stdout+traceback to <name>.out, moves the job to done/
  - freshness: before each job, every lcpc_proof_of_storage_tpu.* and
              scripts module is purged from sys.modules so repo edits are
              picked up (the XLA disk cache keeps recompiles fast); the jax/
              axon modules are kept (they hold the tunnel session)
  - poison:   a RESOURCE_EXHAUSTED poisons the process backend (every later
              device call fails) -> worker writes POISONED and exits 2; the
              launcher restarts it
  - stop:     submit a job file named `STOP` (content ignored)
  - liveness: worker touches HEARTBEAT (mtime) every poll

Launch via scripts/launch_worker.sh (retry wrapper for the register() race).
"""

import io
import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lcpc_tpu_xla_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SPOOL = os.environ.get("LCPC_WORKER_SPOOL", "/tmp/lcpc_r4_jobs")


def log(msg: str) -> None:
    print(f"[worker {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def purge_repo_modules() -> None:
    for name in list(sys.modules):
        if name.startswith("lcpc_proof_of_storage_tpu") or name in (
            "bench_protocol", "bench_serving", "bench_streaming",
            "microbench", "profile_commit", "profile_protocol",
            "phase_breakdown", "tpu_validate_bench",
        ):
            del sys.modules[name]


def main() -> None:
    os.makedirs(SPOOL, exist_ok=True)
    os.makedirs(os.path.join(SPOOL, "done"), exist_ok=True)

    t0 = time.time()
    log("warming up the chip (jax.devices + first readback)...")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    devs = jax.devices()
    log(f"devices after {time.time()-t0:.0f}s: {devs}")
    x = jnp.arange(1024, dtype=jnp.uint32)
    val = int(jnp.sum(x))  # forced readback = real warmup
    assert val == 1024 * 1023 // 2
    warm_s = time.time() - t0
    with open(os.path.join(SPOOL, "READY"), "w") as f:
        f.write(json.dumps({"warmup_s": warm_s, "pid": os.getpid(),
                            "devices": str(devs)}))
    log(f"READY (warmup {warm_s:.0f}s)")

    while True:
        # heartbeat
        with open(os.path.join(SPOOL, "HEARTBEAT"), "w") as f:
            f.write(str(time.time()))
        jobs = sorted(
            f for f in os.listdir(SPOOL)
            if f.endswith(".py") and not f.endswith(".tmp"))
        if os.path.exists(os.path.join(SPOOL, "STOP")):
            os.remove(os.path.join(SPOOL, "STOP"))
            log("STOP received; exiting")
            return
        if not jobs:
            time.sleep(5)
            continue
        name = jobs[0]
        path = os.path.join(SPOOL, name)
        with open(path) as f:
            src = f.read()
        log(f"running job {name}")
        purge_repo_modules()
        buf = io.StringIO()
        ok = True
        poisoned = False
        jt0 = time.time()

        class _Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.__stdout__.write(s)
                sys.__stdout__.flush()
                return len(s)

        old_stdout = sys.stdout
        sys.stdout = _Tee()
        try:
            exec(compile(src, path, "exec"), {"__name__": "__main__"})
        except BaseException as e:  # noqa: BLE001 - jobs must not kill us
            ok = False
            buf.write("\n" + traceback.format_exc())
            if "RESOURCE_EXHAUSTED" in repr(e):
                poisoned = True
        finally:
            sys.stdout = old_stdout
        dur = time.time() - jt0
        out_path = os.path.join(SPOOL, "done", name + ".out")
        with open(out_path, "w") as f:
            f.write(f"# job={name} ok={ok} dur={dur:.1f}s\n")
            f.write(buf.getvalue())
        os.replace(path, os.path.join(SPOOL, "done", name))
        log(f"job {name} {'ok' if ok else 'FAILED'} in {dur:.1f}s")
        if poisoned:
            with open(os.path.join(SPOOL, "POISONED"), "w") as f:
                f.write(name)
            log("backend poisoned by RESOURCE_EXHAUSTED; exiting for restart")
            sys.exit(2)


if __name__ == "__main__":
    main()
