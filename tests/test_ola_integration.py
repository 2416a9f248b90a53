"""Integration: full 12-table trace generation + all 19 cross-table lookup
products must balance (the CTL grand-product assertion inside
cross_table_lookup_data), plus per-table constraint checks on the full
harness traces."""

import numpy as np
import pytest

from olavm_tpu.runtime.harness import run_program_full
from olavm_tpu.stark.challenger import Challenger
from olavm_tpu.stark.config import StarkConfig
from olavm_tpu.stark.cross_table_lookup import cross_table_lookup_data
from olavm_tpu.tables.ola_stark import OlaStark, generate_traces

pytestmark = pytest.mark.slow

ASM_DIR = "/root/reference/assembler/test_data/asm"


def build_all(name, calldata=None):
    process, program, tree = run_program_full(f"{ASM_DIR}/{name}", calldata)
    ola = OlaStark()
    traces = generate_traces(program, ola)
    return ola, traces, program


@pytest.mark.parametrize(
    "name,calldata",
    [
        ("memory.json", None),
        ("fibo_loop.json", [10, 1, 2, 1015130275]),
        ("storage_u32.json", [0, 2364819430]),
        ("poseidon_hash.json", [0, 1239976900]),
    ],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_ctl_products_balance(name, calldata):
    ola, traces, _ = build_all(name, calldata)
    config = StarkConfig.standard_fast_config()
    challenger = Challenger()
    challenger.observe_element(123)  # arbitrary transcript point
    # raises AssertionError on any CTL product mismatch
    ctl_data = cross_table_lookup_data(
        config, traces, ola.cross_table_lookups, challenger
    )
    assert len(ctl_data) == 12
    total_zs = sum(len(d) for d in ctl_data)
    assert total_zs > 0


def test_all_table_constraints_on_harness():
    from tests.test_tables_cpu import eval_on_subgroup

    ola, traces, _ = build_all("storage_u32.json", [0, 2364819430])
    for idx, stark in enumerate(ola.starks):
        failures = eval_on_subgroup(stark, traces[idx])
        assert not failures, f"table {idx}: {failures[:5]}"
