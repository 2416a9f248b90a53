"""Per-kernel roofline report: NTT Gelem/s/chip, Merkle hash throughput,
quotient (constraint-eval) throughput, vs the HBM speed-of-light bound.

The BASELINE.json north-star asks for "NTT Gelem/s/chip vs roofline" and
per-kernel benchmarks for NTT butterfly / Poseidon round / constraint eval
(the reference's hot loops: plonky2/field/src/fft.rs, hash/poseidon.rs,
circuits/src/stark/prover.rs:571-660). Every kernel here is
bandwidth-bound on TPU (integer VPU work hides under HBM traffic), so the
roofline model is bytes-moved / peak-HBM-bandwidth:

  NTT (radix-2, in-place stages): log2(n) passes x (read+write) x 8 bytes
  per element  ->  SoL elem/s = BW / (16 * log2 n).
  Merkle level (blake3/poseidon compress): 64B in + 32B out per node
  ->  SoL nodes/s = BW / 96.
  Quotient eval: reads 2 trace windows (local+next) of C columns x 8B,
  writes num_alphas accumulators -> SoL rows/s = BW / (16*C + 8*A).

Usage:  python tools/roofline.py [--log-n 20] [--cols 16] [--json out.json]
Writes ROOFLINE.json at the repo root by default and prints one line per
kernel. Runs on whatever backend JAX selects (TPU when available).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# peak HBM bandwidth per chip, bytes/s (public spec numbers)
HBM_BW = {
    "TPU v5 lite": 819e9,     # v5e
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,         # v5p
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,    # v6e / Trillium
    "cpu": 50e9,              # nominal DDR figure for smoke runs
}


def _bw_for(device) -> float:
    kind = getattr(device, "device_kind", "cpu")
    for k, v in HBM_BW.items():
        if k.lower() in str(kind).lower():
            return v
    return HBM_BW["cpu"]


def _sync(out):
    """Force execution of everything queued: pull ONE element of the last
    output (block_until_ready is a no-op through the axon tunnel; the
    device stream is in-order, so a 4-byte pull of the newest result fences
    every prior dispatch)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def _timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    # subtract one D2H pull latency (~25-50 ms through the tunnel)
    t = (time.perf_counter() - t0 - _PULL_LATENCY[0]) / reps
    return max(t, 1e-9)


_PULL_LATENCY = [0.0]


def _calibrate_pull():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.uint32)
    np.asarray(f(x))
    t0 = time.perf_counter()
    np.asarray(f(x))
    _PULL_LATENCY[0] = time.perf_counter() - t0


def measure(log_n: int = 20, cols: int = 16) -> dict:
    import jax

    from olavm_tpu.field import gf
    from olavm_tpu.merkle import device as dmerkle
    from olavm_tpu.ntt import ntt as dntt
    from olavm_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    _calibrate_pull()
    dev = jax.devices()[0]
    bw = _bw_for(dev)
    n = 1 << log_n
    rng = np.random.RandomState(0)

    results = {
        "device": str(getattr(dev, "device_kind", dev)),
        "hbm_peak_bytes_per_s": bw,
        "kernels": {},
    }

    # ---- NTT ------------------------------------------------------------
    vals = gf.from_u64(rng.randint(0, 1 << 63, size=(cols, n)).astype(np.uint64))
    ntt_fn = jax.jit(lambda lo, hi: tuple(dntt.ntt(gf.GF(lo, hi))))
    t = _timeit(ntt_fn, vals.lo, vals.hi)
    elems = cols * n
    sol = bw / (16 * log_n)  # bytes: log_n passes x rw x 8B/elem
    results["kernels"]["ntt"] = {
        "shape": [cols, n],
        "seconds": t,
        "gelem_per_s": elems / t / 1e9,
        "sol_gelem_per_s": sol * 1 / 1e9,
        "pct_of_roofline": 100.0 * (elems / t) / sol,
    }

    # ---- Merkle compress level (blake3 + poseidon) -----------------------
    for hasher in ("blake3", "poseidon"):
        digs = [
            __import__("jax.numpy", fromlist=["x"]).asarray(
                rng.randint(0, 1 << 32, size=(2 * n,), dtype=np.uint64)
                .astype(np.uint32)
            )
            for _ in range(8)
        ]
        fn = jax.jit(
            lambda *d, h=hasher: tuple(dmerkle.compress_level(list(d), h))
        )
        t = _timeit(fn, *digs)
        nodes = n
        sol_nodes = bw / 96  # 64B read + 32B write per node
        results["kernels"][f"merkle_compress_{hasher}"] = {
            "nodes": nodes,
            "seconds": t,
            "gnodes_per_s": nodes / t / 1e9,
            "sol_gnodes_per_s": sol_nodes / 1e9,
            "pct_of_roofline": 100.0 * (nodes / t) / sol_nodes,
        }

    # ---- constraint eval (quotient inner loop, CmpStark AIR) -------------
    from olavm_tpu.stark.consumer import ConstraintConsumer
    from olavm_tpu.stark.ops import GfOps
    from olavm_tpu.tables.cmp import COL_NUM_CMP, CmpStark

    stark = CmpStark()
    rows = n
    C = COL_NUM_CMP
    tw = gf.from_u64(rng.randint(0, 1 << 63, size=(C, rows)).astype(np.uint64))

    def qfn(l_lo, l_hi, n_lo, n_hi):
        local = gf.GF(l_lo, l_hi)
        nxt = gf.GF(n_lo, n_hi)
        consumer = ConstraintConsumer(
            GfOps, [gf.full((), 3), gf.full((), 5)],
            gf.ones((rows,)), gf.zeros((rows,)), gf.zeros((rows,)),
        )
        stark.eval_packed(
            [local[i] for i in range(C)], [nxt[i] for i in range(C)],
            consumer,
        )
        return tuple(x for a in consumer.accumulators() for x in a)

    jfn = jax.jit(qfn)
    t = _timeit(jfn, tw.lo, tw.hi, tw.lo, tw.hi)
    sol_rows = bw / (16 * C + 8 * 2)
    results["kernels"]["constraint_eval_cmp"] = {
        "rows": rows,
        "columns": C,
        "seconds": t,
        "grows_per_s": rows / t / 1e9,
        "sol_grows_per_s": sol_rows / 1e9,
        "pct_of_roofline": 100.0 * (rows / t) / sol_rows,
    }

    # ---- scaling efficiency over the local mesh --------------------------
    n_dev = len(jax.devices())
    results["n_devices"] = n_dev
    if n_dev > 1:
        from olavm_tpu.parallel.sharded import make_mesh, sharded_commit

        small_bits = min(log_n, 14)
        sn = 1 << small_bits
        sc = max(cols, n_dev)
        sc += (-sc) % n_dev
        x = gf.from_u64(
            rng.randint(0, 1 << 63, size=(sc, sn)).astype(np.uint64)
        )
        mesh = make_mesh(n_dev)
        t0 = time.perf_counter()
        sharded_commit(mesh, x, 3, 4)
        t_n = time.perf_counter() - t0
        mesh1 = make_mesh(1)
        t0 = time.perf_counter()
        sharded_commit(mesh1, x, 3, 4)
        t_1 = time.perf_counter() - t0
        results["scaling"] = {
            "commit_shape": [sc, sn],
            "t_1dev_s": t_1,
            f"t_{n_dev}dev_s": t_n,
            "efficiency_pct": 100.0 * t_1 / (t_n * n_dev),
        }

    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=None)
    ap.add_argument("--cols", type=int, default=16)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    # allow forcing CPU for smoke runs (env vars are too late under this
    # image's sitecustomize, which pre-imports jax; jax.config still works
    # until the backend is first used)
    if os.environ.get("OLAVM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["OLAVM_PLATFORM"])

    default_log_n = 20 if jax.default_backend() != "cpu" else 14
    log_n = args.log_n if args.log_n is not None else default_log_n
    res = measure(log_n, args.cols)
    for name, k in res["kernels"].items():
        rate_key = next(k for k in k if k.startswith("g") and k.endswith("_per_s"))
        print(
            f"{name}: {k[rate_key]:.3f} G/s "
            f"({k['pct_of_roofline']:.1f}% of HBM roofline) "
            f"[{res['device']}]"
        )
    if "scaling" in res:
        print(f"scaling: {res['scaling']['efficiency_pct']:.1f}% efficiency "
              f"at {res['n_devices']} devices")
    out = args.json or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ROOFLINE.json",
    )
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
