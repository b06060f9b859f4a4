"""Single-process TPU validation + bench for the Pallas NTT path.

Enables the persistent compilation cache so repeated runs skip Mosaic
compiles.  Run: python scripts/tpu_validate_bench.py [log2n]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lcpc_tpu_xla_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import random


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from lcpc_proof_of_storage_tpu.fields.field import FT63, FT255
    from lcpc_proof_of_storage_tpu.fields.limb import limb_field
    from lcpc_proof_of_storage_tpu.ops.ntt import ntt
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas import ntt_pallas

    t = time.time()
    _ = int(jnp.arange(4).sum())
    print(f"# warmup {time.time()-t:.0f}s", flush=True)

    # correctness: ft63 at 8192 exercises small+large stage kernels
    spec = FT63
    lf = limb_field(spec)
    rnd = random.Random(0)
    n, b = 8192, 4
    vals = [[rnd.randrange(spec.modulus) for _ in range(n)] for _ in range(b)]
    X = jnp.stack([lf.array(v) for v in vals])
    ref = np.asarray(jax.jit(lambda a: ntt(a, spec))(X))
    t = time.time()
    got = np.asarray(jax.jit(lambda a: ntt_pallas(a, spec))(X))
    ok = np.array_equal(got, ref)
    print(f"# ft63 n=8192 pallas: {time.time()-t:.0f}s match={ok}", flush=True)
    if not ok:
        sys.exit("MISMATCH ft63")

    # v2 kernels (constant-multiply tables + pair grouping), incl. pruning
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import ntt_pallas2
    t = time.time()
    got2 = np.asarray(jax.jit(lambda a: ntt_pallas2(a, spec))(X))
    ok2 = np.array_equal(got2, ref)
    print(f"# ft63 n=8192 pallas v2: {time.time()-t:.0f}s match={ok2}",
          flush=True)
    if not ok2:
        sys.exit("MISMATCH ft63 v2")
    Xp = jnp.asarray(np.asarray(X).copy())
    Xp = Xp.at[:, n // 4 :, :].set(0)
    refp = np.asarray(jax.jit(lambda a: ntt(a, spec))(Xp))
    gotp = np.asarray(jax.jit(
        lambda a: ntt_pallas2(a, spec, n_nonzero=n // 4))(Xp))
    okp = np.array_equal(gotp, refp)
    print(f"# ft63 v2 pruned match={okp}", flush=True)
    if not okp:
        sys.exit("MISMATCH ft63 v2 pruned")

    # four-step NTT == oracle on real hardware (packed sub-NTT passes,
    # fused twiddle prologue, lane permutations)
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas2 import (
        fs_device_tables, ntt_four_step)
    t = time.time()
    got4 = np.asarray(ntt_four_step(X, spec))
    ok4 = np.array_equal(got4, ref)
    print(f"# ft63 n=8192 four-step: {time.time()-t:.0f}s match={ok4}",
          flush=True)
    if not ok4:
        sys.exit("MISMATCH ft63 four-step")
    Xq = jnp.asarray(np.asarray(X).copy()).at[:, n // 4 :, :].set(0)
    refq = np.asarray(jax.jit(lambda a: ntt(a, spec))(Xq))
    tabs4 = fs_device_tables(spec, n, n_nonzero=n // 4)
    got4p = np.asarray(jax.jit(
        lambda a, tb: ntt_four_step(a, spec, n_nonzero=n // 4, tables=tb)
    )(Xq, tabs4))
    if not np.array_equal(got4p, refq):
        sys.exit("MISMATCH ft63 four-step pruned")
    print("# ft63 four-step pruned match=True", flush=True)

    # pallas blake3 hash == XLA hash, multi-chunk columns
    from lcpc_proof_of_storage_tpu.ops.blake3_jax import hash_columns
    from lcpc_proof_of_storage_tpu.ops.blake3_pallas import hash_columns_pallas
    lfh = limb_field(FT63)
    comm = jnp.asarray(np.random.default_rng(1).integers(
        0, 1 << 15, (300, 512, FT63.num_limbs16), dtype=np.uint32))
    ref_h = np.asarray(jax.jit(lambda c: hash_columns(c, FT63))(comm))
    got_h = np.asarray(jax.jit(lambda c: hash_columns_pallas(c, FT63))(comm))
    okh = np.array_equal(got_h, ref_h)
    print(f"# blake3 pallas hash match={okh}", flush=True)
    if not okh:
        sys.exit("MISMATCH blake3 pallas")

    # packed-operand fused expander matvec == XLA gather path
    from lcpc_proof_of_storage_tpu.ops.expander import (
        SDIG_CODE_3, gather_matvec, generate, to_gather)
    import lcpc_proof_of_storage_tpu.ops.expander_pallas as ep
    pre, _post = generate(3000, 0, FT63, SDIG_CODE_3)
    gm = to_gather(pre[0], FT63)
    xs = jnp.asarray(np.random.default_rng(2).integers(
        0, 1 << 15, (2, gm.cols, FT63.num_limbs16), dtype=np.uint32))
    os.environ["LCPC_NO_PALLAS"] = "1"        # reference = plain XLA gather
    ref_m = np.asarray(jax.jit(
        lambda a: gather_matvec(gm, a, FT63, tables=(jnp.asarray(gm.idx),
                                                     jnp.asarray(gm.vals))))(xs))
    os.environ.pop("LCPC_NO_PALLAS", None)
    for mode in ("1", "0"):
        os.environ["LCPC_EXPANDER_PACKED"] = mode
        tabs = tuple(jnp.asarray(t) for t in ep.fused_device_tables(gm, FT63))
        got_m = np.asarray(jax.jit(
            lambda a, tb: ep.gather_matvec_fused(gm, a, FT63, tables=tb)
        )(xs, tabs))
        okm = np.array_equal(got_m, ref_m)
        print(f"# expander fused packed={mode} match={okm}", flush=True)
        if not okm:
            sys.exit(f"MISMATCH expander packed={mode}")
    os.environ.pop("LCPC_EXPANDER_PACKED", None)

    # bench: ft255 commit NTT at the 2^log2n dims
    spec = FT255
    n_cols = 1 << (log2n - 5)        # rho=1/4 square-ish: (2^(l-5) rows... )
    batch = (1 << log2n) // (n_cols // 4)
    # replicate bench dims: n_per_row = n_cols/4, n_rows = N / n_per_row
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 16, (batch, n_cols, spec.num_limbs16), dtype=np.uint32))
    for name, fn in (("v1", lambda a: ntt_pallas(a, spec)),
                     ("v2", lambda a: ntt_pallas2(a, spec))):
        g = jax.jit(lambda a, fn=fn: fn(a).sum(dtype=jnp.uint32))
        t = time.time()
        _ = int(g(x))
        print(f"# ft255 {name} ntt b{batch} n{n_cols} compile+run "
              f"{time.time()-t:.0f}s", flush=True)
        best = 1e9
        for _i in range(3):
            t = time.time()
            _ = int(g(x))
            best = min(best, time.time() - t)
        total = batch * n_cols
        print(f"ft255 pallas {name} ntt b{batch}xn{n_cols}: "
              f"{best*1000:.0f} ms ({total/best/1e6:.1f}M enc-elems/s)",
              flush=True)


if __name__ == "__main__":
    main()
