"""Headline benchmark: full OlaVM pipeline prove time (execute -> trace-gen ->
12-table STARK prove) on the reference's fibonacci workload
(/root/reference/circuits/benches/fibo_loop.rs:46,100).

Reference baseline (BASELINE.md / README.md:69): fib(47)x1000 -> 2^20 CPU rows,
prove = 39.767 s on a 64-core Linux box. `vs_baseline` is reported as
speedup = (reference seconds, scaled to our row count by n*log n) / (our
seconds), so >1.0 means faster than the reference at the same work.

Env: OLAVM_BENCH_LOG_ROWS (default 16) picks the CPU-table size; at 20 this
is exactly the reference benchmark.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_SECONDS = 39.767
REF_LOG_ROWS = 20
ASM = "/root/reference/assembler/test_data/asm/fibo_loop.json"


def main():
    log_rows = int(os.environ.get("OLAVM_BENCH_LOG_ROWS", "16"))

    from olavm_tpu.runtime.harness import run_program_full
    from olavm_tpu.stark.config import StarkConfig
    from olavm_tpu.stark.prover import prove_with_traces
    from olavm_tpu.stark.verifier import verify_proof
    from olavm_tpu.tables.ola_stark import OlaStark, generate_traces

    # the reference workload runs fib(47) `times` times: 1000 reps -> 866,115
    # cpu rows (README.md:69); scale reps to fill just under 2^log_rows.
    times = max(1, int((1 << log_rows) * 1000 / 866115 * 0.99))
    calldata = [47, times, 2, 4185064725]

    t0 = time.time()
    process, program, tree = run_program_full(ASM, calldata)
    t_exec = time.time() - t0

    ola = OlaStark()
    t0 = time.time()
    traces = generate_traces(program, ola)
    t_gen = time.time() - t0

    config = StarkConfig.standard_fast_config()
    t0 = time.time()
    proof = prove_with_traces(ola, config, traces)
    t_prove = time.time() - t0

    verify_proof(ola, proof, config)

    rows = traces[0].shape[1]
    actual_log = int(math.log2(rows))
    # n log n scaling of the reference number to our actual row count
    ref_scaled = REF_SECONDS * (rows * actual_log) / ((1 << REF_LOG_ROWS) * REF_LOG_ROWS)
    print(
        f"# exec={t_exec:.2f}s trace_gen={t_gen:.2f}s prove={t_prove:.2f}s "
        f"cpu_rows=2^{actual_log} steps={len(program.trace.exec)}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"fibo_prove_2^{actual_log}_rows",
        "value": round(t_prove, 3),
        "unit": "s",
        "vs_baseline": round(ref_scaled / t_prove, 3),
    }))


if __name__ == "__main__":
    main()
