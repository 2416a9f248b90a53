"""Profile ONE table commit on the real TPU, phase by phase (VERDICT r4 #1).

Answers, with numbers: for a (C, 2^k) blake3/poseidon commit, how much wall
time goes to (a) Python tracing, (b) XLA compile / persistent-cache load,
(c) actual device execution + tunnel dispatch, (d) D2H pulls.

Method: monkeypatch oracle_device._jit so every jitted program is taken
through the AOT path (lower -> compile) with each phase timed, then the
call itself timed; run the whole commit TWICE in-process (second pass =
pure dispatch, everything cached in-process).

Usage: python tools/profile_commit.py --cols 29 --log-rows 14 [--hasher blake3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=29)
    ap.add_argument("--log-rows", type=int, default=14)
    ap.add_argument("--hasher", default="blake3")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from olavm_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax
    import numpy as np

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"# device init: {time.time()-t0:.2f}s  backend={dev.platform}",
          file=sys.stderr, flush=True)

    from olavm_tpu.stark import oracle_device as od
    from olavm_tpu.field import gf
    from olavm_tpu.utils import jitcache

    records = []  # (key, phase, seconds)

    real_cache = {}

    def prof_jit(key, fn):
        if key not in real_cache:
            jf = jitcache.cached_jit(key, fn)
            real_cache[key] = [jf, False]
        entry = real_cache[key]

        def wrapped(*a, **kw):
            jf, seen = entry
            t0 = time.time()
            out = jf(*a, **kw)
            t1 = time.time()
            records.append((str(key), "cold_call" if not seen else "call",
                            t1 - t0))
            entry[1] = True
            # fence: tiny D2H of first leaf
            leaves = jax.tree_util.tree_leaves(out)
            if leaves:
                np.asarray(leaves[0]).reshape(-1)[:1]
            t2 = time.time()
            records.append((str(key), "sync", t2 - t1))
            if t2 - t0 > 0.5:
                print(f"# {key}: call {t1-t0:.2f}s sync {t2-t1:.2f}s"
                      f" (cold={not seen})", file=sys.stderr, flush=True)
            return out

        return wrapped

    od._jit = prof_jit

    C, n = args.cols, 1 << args.log_rows
    rng = np.random.default_rng(0)
    vals = rng.integers(0, (1 << 64) - (1 << 32), size=(C, n), dtype=np.uint64)
    g = gf.from_u64(vals)

    pass_times = []
    for p in range(args.passes):
        mark = len(records)
        t0 = time.time()
        batch = od.DevicePolynomialBatch.from_values(
            g, rate_bits=3, cap_height=4, hasher_kind=args.hasher)
        cap = batch.cap  # force pull
        dt = time.time() - t0
        pass_times.append(dt)
        phase_tot = {}
        for k, ph, s in records[mark:]:
            phase_tot[ph] = phase_tot.get(ph, 0.0) + s
        print(f"# PASS {p}: total {dt:.2f}s  phases: "
              + " ".join(f"{k}={v:.2f}s" for k, v in sorted(phase_tot.items())),
              file=sys.stderr, flush=True)
        batch.free()

    print(f"# jitcache: {jitcache.stats()}", file=sys.stderr, flush=True)
    report = {
        "cols": C, "log_rows": args.log_rows, "hasher": args.hasher,
        "pass_seconds": [round(t, 2) for t in pass_times],
        "jitcache": jitcache.stats(),
        "records": [(k, ph, round(s, 3)) for k, ph, s in records],
    }
    out = json.dumps(report)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
