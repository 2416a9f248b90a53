"""Level-synchronous batched SMT block processing must be bit-identical to
sequential application (roots, node state, and every HashTrace field) —
VERDICT r3 item 8; the reference analogue is the rayon-parallel per-level
hashing in core/src/merkle_tree/patch.rs:159,187."""

import pytest

from olavm_tpu.tree.smt import AccountTree

pytestmark = pytest.mark.smoke  # host-only: no jit (native/numpy Poseidon)


def _mk_logs():
    # same key twice (write-after-write), adjacent keys (sibling paths that
    # interact at depth 0), a read of an earlier write, a distant key, and a
    # read of a never-written key
    k1 = (0, 0, 0, 5)
    k2 = (0, 0, 0, 4)   # sibling of k1 at the leaf level
    k3 = (1, 2, 3, 4)
    k4 = (0, 0, 0, 7)   # shares upper path with k1/k2
    return [
        {"key": k1, "kind": "write", "value": (10, 11, 12, 13)},
        {"key": k2, "kind": "write", "value": (20, 21, 22, 23)},
        {"key": k1, "kind": "write", "value": (30, 31, 32, 33)},
        {"key": k3, "kind": "write", "value": (40, 41, 42, 43)},
        {"key": k1, "kind": "read"},
        {"key": k4, "kind": "read"},
        {"key": k2, "kind": "write", "value": (50, 51, 52, 53)},
    ]


def _trace_tuple(t):
    return (t.row, t.path, t.sibling, t.pre_hash, t.pre_path, t.pre_row)


def test_level_sync_matches_sequential():
    logs = _mk_logs()
    t_seq = AccountTree()
    t_bat = AccountTree()
    tr_seq = t_seq._process_block_sequential(logs)
    tr_bat = t_bat.process_block(logs)

    assert t_seq.root_hash() == t_bat.root_hash()
    assert t_seq.nodes == t_bat.nodes
    assert len(tr_seq) == len(tr_bat)
    for a, b in zip(tr_seq, tr_bat):
        assert _trace_tuple(a) == _trace_tuple(b)


def test_level_sync_across_blocks():
    # state carried between blocks must match too
    logs = _mk_logs()
    t_seq = AccountTree()
    t_bat = AccountTree()
    t_seq._process_block_sequential(logs[:3])
    t_bat.process_block(logs[:3])
    tr_seq = t_seq._process_block_sequential(logs[3:])
    tr_bat = t_bat.process_block(logs[3:])
    assert t_seq.root_hash() == t_bat.root_hash()
    assert t_seq.nodes == t_bat.nodes
    for a, b in zip(tr_seq, tr_bat):
        assert _trace_tuple(a) == _trace_tuple(b)
