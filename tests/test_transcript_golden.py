"""Golden Fiat-Shamir transcript fixtures: any change to the challenger
observation order, cap hashing, permutation/CTL Z computation, quotient,
FRI folding, PoW grind, or proof serialization changes these frozen values
and fails this test (VERDICT round 1, item 5).

The reference Rust prover cannot run in this environment, so the fixtures
were generated ONCE from this prover on the deterministic toy system in
test_stark_framework (numpy seed 0, blake3 caps, lowest-nonce PoW) and
frozen at tests/fixtures/transcript_golden.json. They protect against
transcript-order REGRESSIONS; a byte-diff against the Rust reference
remains an open item (documented in README).
"""

import hashlib
import json
import os

import numpy as np
import pytest

from olavm_tpu.stark.challenger import Challenger
from olavm_tpu.stark.config import StarkConfig
from olavm_tpu.stark.prover import prove_with_traces
from olavm_tpu.stark.serialization import serialize_all_proof

from test_stark_framework import ToySystem, build_traces

pytestmark = pytest.mark.smoke  # host-only: no jit, fast cold

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "transcript_golden.json")


def _capture():
    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    traces = build_traces(32)
    proof = prove_with_traces(system, config, traces)

    hasher = config.hasher()
    chal = Challenger()
    for sp in proof.stark_proofs:
        chal.observe_cap(sp.trace_cap, hasher)
    post_cap_challenges = chal.get_n_challenges(2)

    blob = serialize_all_proof(proof)
    return {
        "trace_cap_t0_row0": [int(v) for v in proof.stark_proofs[0].trace_cap[0]],
        "trace_cap_t1_row0": [int(v) for v in proof.stark_proofs[1].trace_cap[0]],
        "challenges_after_caps": [int(c) for c in post_cap_challenges],
        "zs_cap_t0_row0": [
            int(v) for v in proof.stark_proofs[0].permutation_ctl_zs_cap[0]
        ],
        "quotient_cap_t0_row0": [
            int(v) for v in proof.stark_proofs[0].quotient_polys_cap[0]
        ],
        "pow_witness_t0": int(proof.stark_proofs[0].opening_proof.pow_witness),
        "final_poly_t0_c0": [
            int(v)
            for v in np.asarray(
                proof.stark_proofs[0].opening_proof.final_poly[0]
            ).reshape(-1)
        ],
        "proof_sha256": hashlib.sha256(blob).hexdigest(),
        "proof_len": len(blob),
    }


def test_transcript_matches_golden_fixture():
    got = _capture()
    if not os.path.exists(FIXTURE):
        pytest.fail(
            f"golden fixture missing; regenerate with "
            f"python tests/test_transcript_golden.py (would be: "
            f"{json.dumps(got)[:200]}...)"
        )
    with open(FIXTURE) as f:
        want = json.load(f)
    # compare field by field for a readable failure
    for key in want:
        assert got[key] == want[key], (
            f"transcript regression at {key!r}: {got[key]} != {want[key]}"
        )
    assert set(got) == set(want)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump(_capture(), f, indent=2)
    print(f"wrote {FIXTURE}")
