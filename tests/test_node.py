"""OlaVM node API: deploy + execute_tx with cross-contract calls
(reference zk-vm/src/test.rs:44 sccall_run_test), then validate the merged
tx trace: all 12 tables generate and every cross-table lookup balances."""

import pytest

from olavm_tpu.assembler.encoder import encode_asm_from_json_file
from olavm_tpu.node.olavm import OlaVM
from olavm_tpu.stark.challenger import Challenger
from olavm_tpu.stark.config import StarkConfig
from olavm_tpu.stark.cross_table_lookup import cross_table_lookup_data
from olavm_tpu.tables.ola_stark import OlaStark, generate_traces

pytestmark = pytest.mark.slow

ASM_DIR = "/root/reference/assembler/test_data/asm"

CALLER_ADDR = (1, 1, 1, 1)
CALLER_EXE_ADDR = (1, 1, 1, 1)
CALLEE_EXE_ADDR = (1, 0, 1, 0)


def _make_node():
    node = OlaVM()
    caller_bp = encode_asm_from_json_file(f"{ASM_DIR}/sccall/sccall_caller.json")
    callee_bp = encode_asm_from_json_file(f"{ASM_DIR}/sccall/sccall_callee.json")
    node.manual_deploy(caller_bp, CALLER_EXE_ADDR)
    node.manual_deploy(callee_bp, CALLEE_EXE_ADDR)
    return node


@pytest.mark.parametrize("selector,kind", [(645225708, "delegate"),
                                           (3761623135, "call")])
def test_sccall_execute_tx(selector, kind):
    node = _make_node()
    calldata = [1, 0, 1, 0, 4, selector]
    node.execute_tx(CALLER_ADDR, CALLER_EXE_ADDR, calldata)
    trace = node.ola_state.gen_tx_trace()
    assert trace.sc_call, "no sccall rows recorded"
    assert len({s.env_idx for s in trace.exec}) >= 2, "expected 2+ envs"
    # the merged trace must be CTL-consistent across all 12 tables
    class _P:
        pass

    prog = _P()
    prog.trace = trace
    ola = OlaStark()
    traces = generate_traces(prog, ola)
    challenger = Challenger()
    challenger.observe_element(7)
    ctl_data = cross_table_lookup_data(
        StarkConfig.standard_fast_config(), traces, ola.cross_table_lookups,
        challenger,
    )
    assert len(ctl_data) == 12

    from tests.test_tables_cpu import eval_on_subgroup

    for idx, stark in enumerate(ola.starks):
        failures = eval_on_subgroup(stark, traces[idx])
        assert not failures, f"table {idx}: {failures[:5]}"


def test_deploy_persists_across_instances(tmp_path):
    tree_db = str(tmp_path / "tree.db")
    state_db = str(tmp_path / "state.db")
    node = OlaVM(tree_db, state_db)
    bp = encode_asm_from_json_file(f"{ASM_DIR}/fibo_loop.json")
    code_hash = node.manual_deploy(bp, (2, 2, 2, 2))

    node2 = OlaVM(tree_db, state_db)
    assert node2.ola_state.get_contract_map((2, 2, 2, 2)) == code_hash
    node2.execute_tx((2, 2, 2, 2), (2, 2, 2, 2), [5, 1, 2, 1015130275])
    trace = node2.ola_state.gen_tx_trace()
    assert trace.exec, "no execution steps"
