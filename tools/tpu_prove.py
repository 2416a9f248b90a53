"""Drive a full 12-table device prove on the TPU at a chosen scale.

Used three ways (VERDICT r3 items 1-3):
  * cache prewarm:  python tools/tpu_prove.py --log-rows 20
      populates the persistent XLA compile cache with every graph the bench
      needs, in a resumable way (re-running skips already-cached compiles);
  * mid-scale gate: python tools/tpu_prove.py --log-rows 14 --out PERF_SMOKE.json
      minutes-scale TPU regression test with per-phase timings + HBM peaks,
      so scale failures are found OUTSIDE the bench driver;
  * phase profiling: --repeat 2 reports warm steady-state per-phase times.

Writes a JSON report: phase wall times, jit/compile counters, HBM peak,
proof size, verify status.

Workload: the reference bench workload (fib(47) x times scaled to fill
2^log_rows cpu rows; /root/reference/circuits/benches/fibo_loop.rs:30-46).
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-rows", type=int, default=14)
    ap.add_argument("--workload", default="fib", choices=["fib", "sqrt"])
    ap.add_argument("--repeat", type=int, default=1,
                    help="prove passes (>=2 measures warm steady state)")
    ap.add_argument("--out", default=None, help="JSON report path")
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--hasher", default="blake3")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level="INFO", stream=sys.stderr,
                        format="%(asctime)s %(name)s %(message)s")

    from olavm_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax

    report = {"log_rows": args.log_rows, "workload": args.workload,
              "backend": jax.default_backend(), "phases": {}, "proves": []}

    from bench import REF, REF_LOG_ROWS, REF_REPS

    ref_seconds, steps_per_rep, asm = REF[args.workload]
    if args.log_rows == REF_LOG_ROWS:
        times = REF_REPS[args.workload]
    else:
        times = max(1, int((1 << args.log_rows) * 0.99 / steps_per_rep))
    if args.workload == "fib":
        calldata = [47, times, 2, 4185064725]
    else:
        calldata = [1073741824, times, 2, 3509365327]

    from olavm_tpu.runtime.harness import run_program_fast
    from olavm_tpu.stark.config import StarkConfig
    from olavm_tpu.stark.verifier import verify_proof
    from olavm_tpu.tables.fast_gen import generate_traces_fast
    from olavm_tpu.tables.ola_stark import OlaStark
    from olavm_tpu.stark.prover_device import prove_with_traces_device
    from olavm_tpu.stark.serialization import serialize_all_proof
    from olavm_tpu.utils.timing import TimingTree

    t0 = time.time()
    fast_run, process, program, tree = run_program_fast(asm, calldata)
    report["phases"]["execute"] = round(time.time() - t0, 2)

    ola = OlaStark()
    t0 = time.time()
    traces = generate_traces_fast(fast_run, program, ola, process)
    report["phases"]["trace_gen"] = round(time.time() - t0, 2)
    report["rows"] = {i: list(t.shape) for i, t in enumerate(traces)}
    actual_log = int(math.log2(traces[0].shape[1]))
    assert actual_log == args.log_rows, (
        f"built 2^{actual_log}, wanted 2^{args.log_rows}")

    config = StarkConfig.standard_fast_config()
    config.merkle_hasher = args.hasher

    proof = None
    for it in range(args.repeat):
        timing = TimingTree()
        t0 = time.time()
        proof = prove_with_traces_device(ola, config, traces, timing=timing)
        dt = time.time() - t0
        report["proves"].append(round(dt, 2))
        print(f"# prove pass {it}: {dt:.2f}s", file=sys.stderr)
        timing.print(min_secs=0.2, file=sys.stderr)

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        report["hbm_peak_gib"] = round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass

    blob = serialize_all_proof(proof)
    report["proof_bytes"] = len(blob)

    if not args.no_verify:
        t0 = time.time()
        verify_proof(ola, proof, config)
        report["phases"]["verify"] = round(time.time() - t0, 2)

    report["ok"] = True

    # a completed prove here means every cache tier is warm for this shape:
    # record it in the same marker bench.py consults, so the driver's bench
    # run skips its warmup pass (VERDICT r4 weak #2: never two full proves
    # in one driver budget)
    try:
        from olavm_tpu.utils.platform import cache_tag

        marker = os.path.join(
            os.path.expanduser("~"), ".cache",
            f"olavm_bench_done-{cache_tag()}-{args.workload}-{actual_log}"
            f"-device")
        with open(marker, "w") as f:
            f.write(json.dumps({"prove_s": report["proves"][-1],
                                "time": time.time()}))
    except OSError:
        pass

    out = json.dumps(report)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
