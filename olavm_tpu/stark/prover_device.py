"""Device (TPU) multi-table STARK prover.

Same transcript as the host prover (stark/prover.py; reference
circuits/src/stark/prover.rs) — the Fiat-Shamir challenger, PoW grind and
proof objects stay on host — but every O(n) computation runs on the
accelerator as jitted two-limb GF programs:

  commit    = chunked iNTT -> coset-LDE -> column-wise leaf hashing ->
              per-level Merkle reduction           (oracle_device)
  Z polys   = associative-scan grand products      (ctl_device)
  quotient  = the SAME per-table AIR code (stark.eval_packed) traced through
              GfOps over row chunks of the evaluation coset
  openings  = power-table inner products at zeta / g*zeta
  FRI       = values-first composition poly, device fold + per-round device
              trees, batched query gathers

Only caps, openings, z-last values, final FRI coefficients, and query
leaves/paths cross device->host (the tunnel's D2H is ~1000x slower than
H2D). Fiat-Shamir challenges cross host->device as traced scalar banks so
every compiled program is reused across proves.
"""

from __future__ import annotations

import logging

import numpy as np

from ..field import extension as ge
from ..field import gf
from ..field import gfe
from ..field import goldilocks as g
from ..utils.bits import bit_reversal_perm, log2_strict, reverse_bits
from ..utils.timing import TimingTree
from .challenger import Challenger
from .config import StarkConfig
from .consumer import ConstraintConsumer
from .cross_table_lookup import CtlCheckVars
from .ctl_device import DevChallenge, ctl_data_device, permutation_z_polys_device
from .fri import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
    fri_proof_of_work,
)
from .oracle_device import (
    DevicePolynomialBatch,
    _jit,
    build_tree_device,
    gather_paths_dev,
    paths_to_host,
)
from .ops import GfOps
from .proof import AllProof, PublicValues, StarkOpeningSet, StarkProof
from .prover import fri_instance_for_stark
from .stark_base import (
    get_n_grand_product_challenge_sets,
    get_permutation_batches,
)

logger = logging.getLogger(__name__)


def _log_hbm(tag: str):
    """HBM watermark per phase (VERDICT r2 1e) — diagnosable OOMs."""
    if not logger.isEnabledFor(logging.INFO):
        return
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        in_use = stats.get("bytes_in_use", 0)
        peak = stats.get("peak_bytes_in_use", 0)
        logger.info("HBM %-28s in_use=%6.2fGiB peak=%6.2fGiB", tag,
                    in_use / 2**30, peak / 2**30)
    except Exception:  # memory_stats unsupported on some backends
        pass

# ---------------------------------------------------------------------------
# quotient
# ---------------------------------------------------------------------------


def compute_quotient_polys_device(stark, config, trace_batch, zs_batch,
                                  permutation_challenges, ctl_data, alphas,
                                  degree_bits, num_permutation_zs,
                                  mesh=None) -> gf.GF:
    """Device compute_quotient_polys (prover.rs:571-705): the same
    stark.eval_packed constraint code, traced through GfOps, with all
    Fiat-Shamir scalars passed as a device bank.

    Memory architecture (round 3): the 2^(degree_bits+qdb) quotient coset
    g*W is split into 2^qdb residue classes {j : j mod 2^qdb == r}; class r
    is itself a degree-n coset (g*w^r)*H, and the "next row" point of j
    (j + 2^qdb, the reference's stride-step window, prover.rs:571-620) stays
    INSIDE the class as a roll-by-1.  One compiled program — shift scalar
    traced — evaluates one class at a time, so the working set is a single
    (C, n) slab instead of the full (C, n<<qdb) LDE plus rolled copies
    (round-2 OOM root cause)."""
    import jax
    import jax.numpy as jnp

    degree = 1 << degree_bits
    qdb = (stark.quotient_degree_factor()).bit_length() - 1
    if (1 << qdb) < stark.quotient_degree_factor():
        qdb += 1
    rate_bits = config.fri_config.rate_bits
    assert qdb <= rate_bits
    size = degree << qdb

    # ----- scalar bank: alphas, permutation challenges, ctl challenges -----
    bank_vals = [int(a) for a in alphas]
    num_alphas = len(alphas)
    perm_meta = None
    if permutation_challenges is not None:
        chal_list = []
        chal_index = {}
        for cs in permutation_challenges:
            for c in cs:
                if id(c) not in chal_index:
                    chal_index[id(c)] = len(bank_vals) + 2 * len(chal_list)
                    chal_list.append(c)
        for c in chal_list:
            bank_vals.extend([c.beta, c.gamma])
        pairs = stark.permutation_pairs()
        batches = get_permutation_batches(
            pairs, permutation_challenges, config.num_challenges,
            stark.permutation_batch_size(),
        )
        perm_meta = tuple(
            tuple((tuple(pair.column_pairs), chal_index[id(chal)])
                  for pair, chal in instances)
            for instances in batches
        )
    ctl_meta = []
    for zc in ctl_data.zs_columns:
        off = len(bank_vals)
        bank_vals.extend([zc.challenge.beta, zc.challenge.gamma])
        ctl_meta.append(off)
    bank = gf.from_u64(np.array(bank_vals, dtype=np.uint64))

    from ..ntt import ntt as dntt

    # per-class coset shifts: class r evaluates on (g * w^r) * H
    w = g.primitive_root_of_unity(degree_bits + qdb)
    shifts = np.array(
        [g.mul(g.MULTIPLICATIVE_GROUP_GENERATOR, pow(w, r, g.P))
         for r in range(1 << qdb)],
        dtype=np.uint64,
    )
    gen = g.primitive_root_of_unity(degree_bits)
    g_last = g.inv(gen)  # gen^{n-1}
    n_inv = g.inv(degree)

    # ----- split program architecture (round 5) ---------------------------
    # A single fused per-class program for the CPU table is a ~19 MB
    # StableHLO module whose XLA compile gets SIGKILLed by the axon compile
    # helper (measured: largest module that compiles is ~4 MB). The class
    # evaluation is split into small programs with identical field
    # arithmetic:
    #   qvals    scale + NTT -> trace/Z values on the class coset
    #   qpart*   partial alpha-Horner accumulators over a SLICE of the
    #            global constraint sequence (eval_packed | permutation args
    #            | CTL checks); consumer.py's group recurrence composes
    #            exactly: a run over [a,b) yields sum_j c_j alpha^{b-1-j}
    #   qfin     sum_p part_p * alpha^{K-b_p}, then * Z_H^{-1}
    from .cross_table_lookup import eval_cross_table_lookup_checks
    from .ops import BaseOps

    def bc(e, shape=(degree,)):
        return gf.GF(jnp.broadcast_to(e.lo, shape),
                     jnp.broadcast_to(e.hi, shape))

    def selectors(shift):
        """(xs, z_last, lagrange_first, lagrange_last, zh_inv) on the class
        coset shift*H (x^n - 1 == shift^n - 1 is constant on the class)."""
        xs = gf.mul(gf.powers(gen, degree), bc(shift))
        xn = gf.exp_const(shift, degree)
        c = gf.sub(xn, gf.full((), 1))
        zh_inv = gf.inv(c)  # () scalar
        c_n = gf.mul(c, gf.full((), n_inv))
        # L_0(x) = (x^n-1)/(n (x-1)); L_{n-1}(x) = (x^n-1) g^{-1}/(n (x-g^{-1}))
        lagrange_first = gf.mul(bc(c_n), gf.inv(gf.sub(xs, gf.full((), 1))))
        z_last = gf.sub(xs, gf.full((), g_last))
        lagrange_last = gf.mul(bc(gf.mul(c_n, gf.full((), g_last))),
                               gf.inv(z_last))
        return xs, z_last, lagrange_first, lagrange_last, zh_inv

    def emit_perm(consumer, F, lv, zs_local, zs_next, bscalar):
        for zi in range(num_permutation_zs):
            consumer.constraint_first_row(
                F.sub(zs_local[zi], F.constant(1)))
        for bi, instances in enumerate(perm_meta or ()):
            red_lhs, red_rhs = [], []
            for (column_pairs, ci) in instances:
                chal = DevChallenge(bscalar(ci), bscalar(ci + 1))
                red_lhs.append(
                    chal.combine_ops(F, [lv[a] for (a, _) in column_pairs]))
                red_rhs.append(
                    chal.combine_ops(F, [lv[b] for (_, b) in column_pairs]))
            prod_lhs = red_lhs[0]
            for t in red_lhs[1:]:
                prod_lhs = F.mul(prod_lhs, t)
            prod_rhs = red_rhs[0]
            for t in red_rhs[1:]:
                prod_rhs = F.mul(prod_rhs, t)
            consumer.constraint(
                F.sub(F.mul(zs_next[bi], prod_rhs),
                      F.mul(zs_local[bi], prod_lhs)))

    def emit_ctls(consumer, F, lv, nv, zs_local, zs_next, bscalar, c0, c1):
        ctl_vars = [
            CtlCheckVars(
                zs_local[num_permutation_zs + i],
                zs_next[num_permutation_zs + i],
                DevChallenge(bscalar(off), bscalar(off + 1)),
                ctl_data.zs_columns[i].columns,
                ctl_data.zs_columns[i].filter_column,
            )
            for i, off in list(enumerate(ctl_meta))[c0:c1]
        ]
        eval_cross_table_lookup_checks(lv, nv, ctl_vars, consumer)

    # --- constraint counting pass: BaseOps on (1,) arrays, no tracing -----
    class _Counting(ConstraintConsumer):
        def __init__(self):
            one = np.full(1, 1, np.uint64)
            super().__init__(BaseOps, [one], one, one, one)
            self.n = 0

        def constraint(self, c):
            self.n += 1

    cc = _Counting()
    ones = [np.full(1, 0, np.uint64) for _ in range(stark.COLUMNS)]
    stark.eval_packed(ones, ones, cc)
    k_stark = cc.n
    k_perm = num_permutation_zs + len(perm_meta or ())
    k_ctl = 2 * len(ctl_meta)
    K = k_stark + k_perm + k_ctl

    # --- part plan: global constraint slices -----------------------------
    import os as _os

    CHUNK = int(_os.environ.get("OLAVM_QPART_CHUNK", "120"))
    parts = []  # (kind, payload, (a, b)) over the global sequence
    a = 0
    while a < k_stark:  # eval_packed slices (jaxpr DCE drops the rest)
        b = min(k_stark, a + CHUNK)
        parts.append(("stark", (a, b), (a, b)))
        a = b
    if k_perm:
        parts.append(("perm", None, (k_stark, k_stark + k_perm)))
    base = k_stark + k_perm
    nctl = len(ctl_meta)
    cchunk = max(1, CHUNK // 2)  # 2 constraints per CTL
    for c0 in range(0, nctl, cchunk):
        c1 = min(nctl, c0 + cchunk)
        parts.append(("ctl", (c0, c1), (base + 2 * c0, base + 2 * c1)))

    class _Slicing(ConstraintConsumer):
        """Accumulate only constraints with global index in [a, b); others
        are counted but dropped (their ops are dead and jax's jaxpr DCE
        removes them before lowering)."""

        def __init__(self, F, alphas, z_last, lf, ll, a, b, start):
            super().__init__(F, alphas, z_last, lf, ll)
            self._a, self._b, self._i = a, b, start

        def constraint(self, c):
            if self._a <= self._i < self._b:
                super().constraint(c)
            self._i += 1

    def make_part_fn(kind, payload, bounds):
        def part_fn(l_lo, l_hi, zl_lo, zl_hi, s_lo, s_hi, bank_lo, bank_hi):
            shift = gf.GF(s_lo, s_hi)
            _, z_last, lagrange_first, lagrange_last, _ = selectors(shift)
            local = gf.GF(l_lo, l_hi)
            zs_local_a = gf.GF(zl_lo, zl_hi)
            nxt = gf.GF(jnp.roll(local.lo, -1, axis=1),
                        jnp.roll(local.hi, -1, axis=1))
            zs_next_a = gf.GF(jnp.roll(zs_local_a.lo, -1, axis=1),
                              jnp.roll(zs_local_a.hi, -1, axis=1))

            def bscalar(i):
                return gf.GF(bank_lo[i], bank_hi[i])

            lv = [local[i] for i in range(stark.COLUMNS)]
            nv = [nxt[i] for i in range(stark.COLUMNS)]
            zs_local = [zs_local_a[i] for i in range(zs_local_a.shape[0])]
            zs_next = [zs_next_a[i] for i in range(zs_next_a.shape[0])]
            alphas_dev = [bscalar(i) for i in range(num_alphas)]
            if kind == "stark":
                a, b = payload
                consumer = _Slicing(GfOps, alphas_dev, z_last,
                                    lagrange_first, lagrange_last, a, b, 0)
                stark.eval_packed(lv, nv, consumer)
            elif kind == "perm":
                consumer = ConstraintConsumer(
                    GfOps, alphas_dev, z_last, lagrange_first, lagrange_last)
                emit_perm(consumer, GfOps, lv, zs_local, zs_next, bscalar)
            else:  # ctl chunk
                c0, c1 = payload
                consumer = ConstraintConsumer(
                    GfOps, alphas_dev, z_last, lagrange_first, lagrange_last)
                emit_ctls(consumer, GfOps, lv, nv, zs_local, zs_next,
                          bscalar, c0, c1)
            outs = []
            for acc in consumer.accumulators():
                acc = bc(acc) if acc.shape != (degree,) else acc
                outs.extend([acc.lo, acc.hi])
            return tuple(outs)

        return part_fn

    def vals_fn(t_lo, t_hi, z_lo, z_hi, s_lo, s_hi):
        shift = gf.GF(s_lo, s_hi)
        spows = gf.powers(shift, degree)
        local = dntt.ntt(gf.mul(gf.GF(t_lo, t_hi), spows[None, :]))
        zs_local = dntt.ntt(gf.mul(gf.GF(z_lo, z_hi), spows[None, :]))
        return local.lo, local.hi, zs_local.lo, zs_local.hi

    part_ends = tuple(b for (_, _, (a, b)) in parts)

    def fin_fn(s_lo, s_hi, bank_lo, bank_hi, *flat):
        # flat: parts x num_alphas x 2 lanes, each (degree,)
        shift = gf.GF(s_lo, s_hi)
        _, _, _, _, zh_inv = selectors(shift)
        outs = []
        for i in range(num_alphas):
            alpha = gf.GF(bank_lo[i], bank_hi[i])
            tot = gf.zeros((degree,))
            for p, b_p in enumerate(part_ends):
                off = p * 2 * num_alphas + 2 * i
                term = gf.GF(flat[off], flat[off + 1])
                e = K - b_p
                if e:
                    term = gf.mul(term, bc(gf.exp_const(alpha, e)))
                tot = gf.add(tot, term)
            q = gf.mul(tot, bc(zh_inv))
            outs.extend([q.lo, q.hi])
        return tuple(outs)

    shapes_key = (type(stark).__name__, trace_batch.coeffs.shape,
                  zs_batch.coeffs.shape, num_permutation_zs, len(ctl_meta),
                  perm_meta)
    part_keys = [("qpart", kind, payload, shapes_key)
                 for (kind, payload, _) in parts]
    n_classes = 1 << qdb
    per_class = [[] for _ in range(num_alphas)]  # [alpha][class] -> GF (n,)
    if mesh is not None and n_classes % mesh.size == 0:
        # MESH-SHARDED quotient (the reference's par_iter over coset chunks,
        # prover.rs:571-660): every residue class is an independent (C, n)
        # evaluation, so classes are distributed over all mesh devices
        # (trace/Z coeffs replicated, shifts sharded); each device vmaps its
        # local classes through the same split programs. Identical exact
        # arithmetic -> the proof stays byte-equal.
        import jax

        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)
        s_all = gf.from_u64(shifts)

        def mesh_call(fn, in_axes, in_specs, nouts, args):
            from ..parallel.sharded import put_with_specs

            sfn = jax.shard_map(
                lambda *a: jax.vmap(fn, in_axes=in_axes)(*a),
                mesh=mesh, in_specs=in_specs,
                out_specs=P(axes, None), check_vma=False)
            with mesh:
                return jax.jit(sfn)(*put_with_specs(mesh, args, in_specs))

        rep, shd = P(), P(axes)
        lv_lo, lv_hi, zv_lo, zv_hi = mesh_call(
            vals_fn, (None, None, None, None, 0, 0),
            (rep, rep, rep, rep, shd, shd), 4,
            (trace_batch.coeffs.lo, trace_batch.coeffs.hi,
             zs_batch.coeffs.lo, zs_batch.coeffs.hi, s_all.lo, s_all.hi))
        flat = []
        for (kind, payload, bounds), _k in zip(parts, part_keys):
            outs = mesh_call(
                make_part_fn(kind, payload, bounds),
                (0, 0, 0, 0, 0, 0, None, None),
                (P(axes, None, None),) * 4 + (shd, shd, rep, rep),
                2 * num_alphas,
                (lv_lo, lv_hi, zv_lo, zv_hi, s_all.lo, s_all.hi,
                 bank.lo, bank.hi))
            flat.extend(outs)
        outs = mesh_call(
            fin_fn, (0, 0, None, None) + (0,) * len(flat),
            (shd, shd, rep, rep) + (P(axes, None),) * len(flat),
            2 * num_alphas,
            (s_all.lo, s_all.hi, bank.lo, bank.hi, *flat))
        for i in range(num_alphas):
            for r in range(n_classes):
                per_class[i].append(
                    gf.GF(outs[2 * i][r], outs[2 * i + 1][r]))
    else:
        vfn = _jit(("qvals", shapes_key), vals_fn)
        pfns = [(_jit(k, make_part_fn(kind, payload, bounds)))
                for k, (kind, payload, bounds) in zip(part_keys, parts)]
        ffn = _jit(("qfin", shapes_key, part_ends, K, CHUNK), fin_fn)
        for r in range(n_classes):
            s = gf.from_u64(shifts[r])
            lv_lo, lv_hi, zv_lo, zv_hi = vfn(
                trace_batch.coeffs.lo, trace_batch.coeffs.hi,
                zs_batch.coeffs.lo, zs_batch.coeffs.hi, s.lo, s.hi)
            flat = []
            for pfn in pfns:
                flat.extend(pfn(lv_lo, lv_hi, zv_lo, zv_hi, s.lo, s.hi,
                                bank.lo, bank.hi))
            outs = ffn(s.lo, s.hi, bank.lo, bank.hi, *flat)
            for i in range(num_alphas):
                per_class[i].append(gf.GF(outs[2 * i], outs[2 * i + 1]))

    # interleave classes back to natural coset order j = (k << qdb) | r
    quotient_values = gf.GF(
        jnp.stack([jnp.stack([ch.lo for ch in per_class[i]], axis=-1)
                   .reshape(size) for i in range(num_alphas)]),
        jnp.stack([jnp.stack([ch.hi for ch in per_class[i]], axis=-1)
                   .reshape(size) for i in range(num_alphas)]),
    )  # (num_alphas, size)

    # interpolate on the coset, split into degree-n chunks (prover.rs:463-478)
    from ..ntt import ntt as dntt

    ifft = _jit(
        ("coset_ifft", quotient_values.shape),
        lambda lo, hi: tuple(dntt.coset_ifft(gf.GF(lo, hi))),
    )
    co_lo, co_hi = ifft(quotient_values.lo, quotient_values.hi)
    limit = degree * stark.quotient_degree_factor()
    tail_nonzero = bool(np.asarray(
        (co_lo[:, limit:].any() | co_hi[:, limit:].any())
    )) if limit < size else False
    if tail_nonzero:
        raise ValueError("quotient not divisible by Z_H — constraint violated")
    chunks_lo = []
    chunks_hi = []
    for i in range(num_alphas):
        for start in range(0, limit, degree):
            chunks_lo.append(co_lo[i, start : start + degree])
            chunks_hi.append(co_hi[i, start : start + degree])
    import jax.numpy as jnp2

    return gf.GF(jnp2.stack(chunks_lo), jnp2.stack(chunks_hi))


# ---------------------------------------------------------------------------
# openings
# ---------------------------------------------------------------------------


def _ext_power_table(z, n: int) -> gfe.GFE:
    """Device [1, z, ..., z^{n-1}] for a host extension point z."""
    ze = gfe.from_u64_pair(np.asarray(z, dtype=np.uint64))
    fn = _jit(("extpows", n),
              lambda r_lo, r_hi, i_lo, i_hi: tuple(
                  x for part in gfe.powers(
                      gfe.GFE(gf.GF(r_lo, r_hi), gf.GF(i_lo, i_hi)), n)
                  for x in part))
    out = fn(ze.re.lo, ze.re.hi, ze.im.lo, ze.im.hi)
    return gfe.GFE(gf.GF(out[0], out[1]), gf.GF(out[2], out[3]))


# ---------------------------------------------------------------------------
# FRI (device)
# ---------------------------------------------------------------------------


def fri_pow_device(current_hash: list[int], fri_config) -> int:
    """Device PoW grind (fri/prover.rs:126-148): one batched Poseidon
    dispatch over 2^18 nonces, argmin of the valid set -> lowest witness
    (deterministic, same as the host grinder). The host numpy grind costs
    ~0.8 s/table; on device it is one dispatch + an 8-byte pull."""
    import jax.numpy as jnp

    from ..hash import poseidon as pos

    from ..utils.platform import on_tpu

    pow_bits = fri_config.proof_of_work_bits
    assert pow_bits <= 32
    # batch size doesn't change the (lowest-nonce) witness — batches scan
    # nonces in order; smaller batches keep CPU-backend tests fast
    B = 1 << 18 if on_tpu() else 1 << 14
    hi_bound = np.uint32(1 << (32 - pow_bits)) if pow_bits else None

    def grind(h_lo, h_hi, start_lo):
        nonces = start_lo + jax.lax.broadcasted_iota(
            jnp.uint32, (B, 1), 0).reshape(B)
        state = [gf.zeros((B,)) for _ in range(12)]
        for i in range(4):
            state[i] = gf.GF(jnp.broadcast_to(h_lo[i], (B,)),
                             jnp.broadcast_to(h_hi[i], (B,)))
        state[4] = gf.GF(nonces, jnp.zeros((B,), jnp.uint32))
        out0 = pos.permute_gf(state)[0]
        valid = out0.hi < hi_bound
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0).reshape(B)
        return jnp.min(jnp.where(valid, idx, B))

    import jax

    fn = _jit(("fripow", B, pow_bits), grind)
    h = gf.from_u64(np.asarray(current_hash, dtype=np.uint64))
    w = 0
    while True:
        idx = int(np.asarray(fn(h.lo, h.hi, np.uint32(w * B))))
        if idx < B:
            return w * B + idx
        w += 1
        assert (w + 1) * B < (1 << 32), "PoW grind exhausted u32 nonces"


class _DeviceExtTree:
    """Commit-phase FRI tree over flattened extension leaves (device).

    With a mesh, leaf absorption and the within-subtree level reduction run
    row-sharded over all devices (bit-reversed order makes every contiguous
    shard a subtree, same layout argument as parallel/sharded.commit_fn) —
    the mesh analogue of the reference's rayon FRI tree
    (plonky2/src/fri/prover.rs:45-70, hash/merkle_tree/mod.rs:146-228)."""

    def __init__(self, values: gfe.GFE, arity: int, cap_height: int,
                 hasher_kind: str, mesh=None):
        from ..merkle import device as dmerkle
        from ..ntt import ntt as dntt

        n = values.shape[0]
        ln = log2_strict(n)
        self.arity = arity
        n_leaves = n // arity

        def brev4(r_lo, r_hi, i_lo, i_hi):
            # decomposed bit-reversal (no flat gather / index constant)
            return tuple(dntt.bitrev_lanes([r_lo, r_hi, i_lo, i_hi], ln))

        bfn = _jit(("fribrev", n), brev4)
        pl = bfn(values.re.lo, values.re.hi, values.im.lo, values.im.hi)
        pv = gfe.GFE(gf.GF(pl[0], pl[1]), gf.GF(pl[2], pl[3]))
        self.values = pv  # bit-reversed, flat (n,) ext

        # STREAMED leaf hashing, <=2 compress blocks per graph: one graph
        # chaining all arity*4 words hits XLA:CPU's pathological execution
        # path past ~2 chained compressions (round-4 finding), and short
        # graphs reuse the same compiled programs across FRI rounds.
        total_cols = 2 * arity  # u64 words per leaf (re, im per ext value)
        flags_np, blen_np, counter_np = dmerkle.absorb_block_meta(total_cols)
        import jax.numpy as jnp

        state = dmerkle.leaf_stream_init(jnp, (n_leaves,), hasher_kind)
        W = 16  # u64 cols per absorb step = 2 blake3 blocks
        bpw = W // 8

        def absorb(r_lo, r_hi, i_lo, i_hi, fl, bl, cn, *st, _s=0, _e=0):
            rl = r_lo.reshape(-1, arity).T
            rh = r_hi.reshape(-1, arity).T
            il = i_lo.reshape(-1, arity).T
            ih = i_hi.reshape(-1, arity).T
            words = []
            for col in range(_s, _e):
                j = col // 2
                if col % 2 == 0:
                    words.extend([rl[j], rh[j]])
                else:
                    words.extend([il[j], ih[j]])
            return tuple(dmerkle.leaf_stream_absorb(
                jnp, list(st), words, fl, bl, hasher_kind, counter_arr=cn))

        use_mesh = mesh is not None and n_leaves % (2 * mesh.size) == 0
        if use_mesh:
            import jax as _jax
            from jax.sharding import PartitionSpec as P

            axes = tuple(mesh.axis_names)
            vec = P(axes)

            from ..parallel.sharded import put_with_specs

            def _shard_absorb(s, e, nstate):
                specs = (vec,) * 4 + (P(), P(), P()) + (vec,) * nstate
                fn = _jax.shard_map(
                    lambda *a, _s=s, _e=e: absorb(*a, _s=_s, _e=_e),
                    mesh=mesh, in_specs=specs,
                    out_specs=(vec,) * nstate, check_vma=False)
                return _jax.jit(fn), specs

            with mesh:
                for s in range(0, total_cols, W):
                    e = min(total_cols, s + W)
                    b0 = s // 8
                    b1 = (2 * (e - s) + 15) // 16 + b0
                    fn, specs = _shard_absorb(s, e, len(state))
                    state = list(fn(*put_with_specs(
                        mesh,
                        (pv.re.lo, pv.re.hi, pv.im.lo, pv.im.hi,
                         flags_np[b0:b1], blen_np[b0:b1],
                         counter_np[b0:b1], *state), specs)))
                digs = dmerkle.leaf_stream_finalize(state, hasher_kind)
                # row-sharded subtree reduction while each device still
                # holds >= 1 pair; tiny tail levels finish unsharded
                levels = [list(digs)]
                m = n_leaves
                cfn = _jax.jit(_jax.shard_map(
                    lambda *ds: tuple(
                        dmerkle.compress_level(list(ds), hasher_kind)),
                    mesh=mesh, in_specs=(vec,) * 8, out_specs=(vec,) * 8,
                    check_vma=False))
                cur = list(digs)
                while m > (1 << cap_height) and m > 2 * mesh.size:
                    cur = list(cfn(*put_with_specs(mesh, cur, (vec,) * 8)))
                    m >>= 1
                    levels.append(cur)
            cur = [jnp.asarray(np.asarray(d)) for d in cur]
            while m > (1 << cap_height):
                fn = _jit(("compress", m, hasher_kind),
                          lambda *ds: tuple(dmerkle.compress_level(
                              list(ds), hasher_kind)))
                cur = list(fn(*cur))
                m >>= 1
                levels.append(cur)
            cap_lanes = levels.pop()
            # re-host retained levels onto the default device: downstream
            # path-gather programs mix them with device-0 arrays, which jax
            # rejects for sharded inputs
            import jax as _jax2

            dev0 = _jax2.devices()[0]
            self.levels_dev = [
                [_jax2.device_put(lane, dev0) for lane in lv]
                for lv in levels
            ]
            self.levels_host = []
            self.cap = dmerkle.digests_to_u64_np(cap_lanes)
        else:
            for s in range(0, total_cols, W):
                e = min(total_cols, s + W)
                fn = _jit(("friabsorb", n, arity, s, e, hasher_kind),
                          lambda *a, _s=s, _e=e: absorb(*a, _s=_s, _e=_e))
                b0 = s // 8
                b1 = (2 * (e - s) + 15) // 16 + b0
                state = list(fn(pv.re.lo, pv.re.hi, pv.im.lo, pv.im.hi,
                                flags_np[b0:b1], blen_np[b0:b1],
                                counter_np[b0:b1], *state))
            digs = dmerkle.leaf_stream_finalize(state, hasher_kind)
            self.levels_dev, self.levels_host, self.cap = build_tree_device(
                digs, n_leaves, cap_height, hasher_kind
            )
        self.n_leaves = n_leaves
        self.cap_height = cap_height

    def leaf_values_dev(self, coset_indices: np.ndarray):
        """(k,) coset indices -> device (k*arity, 4) u32 ext values
        (re_lo, re_hi, im_lo, im_hi lanes)."""
        import jax.numpy as jnp

        idx = np.asarray(coset_indices, dtype=np.int64)
        flat = (idx[:, None] * self.arity
                + np.arange(self.arity)[None, :]).reshape(-1)

        def gather(r_lo, r_hi, i_lo, i_hi, ix):
            return jnp.stack(
                [r_lo[ix], r_hi[ix], i_lo[ix], i_hi[ix]], axis=-1)

        fn = _jit(("frileaves", self.values.shape, len(flat)), gather)
        return fn(self.values.re.lo, self.values.re.hi,
                  self.values.im.lo, self.values.im.hi, jnp.asarray(flat))

    def paths_dev(self, coset_indices: np.ndarray):
        num_path_levels = log2_strict(self.n_leaves) - self.cap_height
        return gather_paths_dev(
            self.levels_dev, coset_indices, num_path_levels
        )


def prove_openings_device(instance, openings_batches, oracles, challenger,
                          config, degree_bits, hasher_kind, timing,
                          mesh=None):
    """Device PolynomialBatch::prove_openings + fri_proof
    (fri/oracle.rs:167-243, fri/prover.rs:20-150).

    Instead of the reference's coefficient-space synthetic division, the
    composition polynomial is built VALUES-FIRST over the LDE coset:
    F(x) = x * sum_b alpha^{suffix_b} (C_b(x) - y_b) / (x - z_b), where
    C_b(x) is an alpha-Horner over the oracles' (device-resident) LDE values
    and y_b = C_b(z_b) is the alpha-reduction of the already-opened values
    (openings_batches, same as the verifier's reduced openings). One iNTT
    recovers the coefficients for folding — no sequential division scan.
    """
    import jax.numpy as jnp

    from .fri import _reduce_with_alpha

    fri_config = config.fri_config
    rate_bits = fri_config.rate_bits
    alpha_host = challenger.get_extension_challenge()
    reduced = [
        ge.t_arr(_reduce_with_alpha(batch, alpha_host))
        for batch in openings_batches
    ]

    n = 1 << (degree_bits + rate_bits)
    size_bits = degree_bits + rate_bits
    alpha = gfe.from_u64_pair(alpha_host)

    def batch_values(batch):
        """C_b(x) over the coset via Horner with alpha (device), computed in
        fused (coset-LDE -> Horner) column blocks so no oracle's full 8x LDE
        is ever resident (round-3 memory architecture)."""
        from .oracle_device import _col_chunks

        # Horner over the batch's polys in REVERSE order, as contiguous
        # per-oracle coefficient runs split into column blocks
        polys = batch.polynomials
        runs = []
        for oi, pi in polys:
            if runs and runs[-1][0] == oi and runs[-1][2] == pi:
                runs[-1] = (oi, runs[-1][1], pi + 1)
            else:
                runs.append((oi, pi, pi + 1))
        acc = gfe.zeros((n,))
        rate_bits_l = rate_bits
        for oi, p0, p1 in reversed(runs):
            coeffs = oracles[oi].coeffs
            deg_n = coeffs.shape[1]
            blocks = [(p0 + s, p0 + e)
                      for s, e in _col_chunks(p1 - p0, n)]
            for s, e in reversed(blocks):
                def horner_lde(a_rlo, a_rhi, a_ilo, a_ihi, lo, hi,
                               al_rlo, al_rhi, al_ilo, al_ihi):
                    # a <- a*alpha^k + sum_j x_j alpha^{k-1-j}, built with a
                    # log-depth power table + tree sum (a k-deep sequential
                    # Horner explodes XLA compile time — round-4 finding);
                    # exact arithmetic, same value as the reference's Horner
                    from ..ntt import ntt as _dntt

                    a = gfe.GFE(gf.GF(a_rlo, a_rhi), gf.GF(a_ilo, a_ihi))
                    al = gfe.GFE(gf.GF(al_rlo, al_rhi), gf.GF(al_ilo, al_ihi))
                    x = _dntt.coset_lde(gf.GF(lo, hi), rate_bits_l)
                    k = x.shape[0]
                    pw = gfe.powers(al, k + 1)

                    def bc(ei):
                        return gfe.GFE(
                            gf.GF(jnp.broadcast_to(ei.re.lo, (n,)),
                                  jnp.broadcast_to(ei.re.hi, (n,))),
                            gf.GF(jnp.broadcast_to(ei.im.lo, (n,)),
                                  jnp.broadcast_to(ei.im.hi, (n,))),
                        )

                    # descending-index Horner => x_j's coefficient is
                    # alpha^j (lower row index = fewer alpha multiplies)
                    terms = [gfe.mul_base(bc(pw[j]), x[j])
                             for j in range(k)]
                    while len(terms) > 1:
                        nxt = [gfe.add(terms[t], terms[t + 1])
                               for t in range(0, len(terms) - 1, 2)]
                        if len(terms) % 2:
                            nxt.append(terms[-1])
                        terms = nxt
                    a = gfe.add(gfe.mul(a, bc(pw[k])), terms[0])
                    return a.re.lo, a.re.hi, a.im.lo, a.im.hi

                fn = _jit(("horner_lde", (e - s, deg_n), rate_bits_l),
                          horner_lde)
                out = fn(acc.re.lo, acc.re.hi, acc.im.lo, acc.im.hi,
                         coeffs.lo[s:e], coeffs.hi[s:e],
                         alpha.re.lo, alpha.re.hi, alpha.im.lo, alpha.im.hi)
                acc = gfe.GFE(gf.GF(out[0], out[1]), gf.GF(out[2], out[3]))
        return acc, len(polys)

    final_values = gfe.zeros((n,))
    xs_key = ("fri_xs", size_bits)

    def xs_build():
        xs = gf.mul(
            gf.powers(g.primitive_root_of_unity(size_bits), n),
            gf.full((), g.MULTIPLICATIVE_GROUP_GENERATOR),
        )
        return xs.lo, xs.hi

    xs_lo, xs_hi = _jit(xs_key, xs_build)()
    xs = gf.GF(xs_lo, xs_hi)

    for batch, y_host in zip(instance.batches, reduced):
        comp, npolys = batch_values(batch)
        z = gfe.from_u64_pair(np.asarray(batch.point, dtype=np.uint64))
        y = gfe.from_u64_pair(np.asarray(y_host, dtype=np.uint64))

        def quotient_values_fn(c_rlo, c_rhi, c_ilo, c_ihi, x_lo, x_hi,
                               z_rlo, z_rhi, z_ilo, z_ihi,
                               y_rlo, y_rhi, y_ilo, y_ihi,
                               f_rlo, f_rhi, f_ilo, f_ihi,
                               s_rlo, s_rhi, s_ilo, s_ihi):
            import jax.numpy as _j

            comp = gfe.GFE(gf.GF(c_rlo, c_rhi), gf.GF(c_ilo, c_ihi))
            xv = gf.GF(x_lo, x_hi)
            z = gfe.GFE(gf.GF(z_rlo, z_rhi), gf.GF(z_ilo, z_ihi))
            y = gfe.GFE(gf.GF(y_rlo, y_rhi), gf.GF(y_ilo, y_ihi))
            fin = gfe.GFE(gf.GF(f_rlo, f_rhi), gf.GF(f_ilo, f_ihi))
            shift = gfe.GFE(gf.GF(s_rlo, s_rhi), gf.GF(s_ilo, s_ihi))

            def bc1(e, shape):
                return gfe.GFE(
                    gf.GF(_j.broadcast_to(e.re.lo, shape),
                          _j.broadcast_to(e.re.hi, shape)),
                    gf.GF(_j.broadcast_to(e.im.lo, shape),
                          _j.broadcast_to(e.im.hi, shape)),
                )

            num = gfe.sub(comp, bc1(y, (n,)))
            den = gfe.sub(gfe.from_base(xv), bc1(z, (n,)))
            q = gfe.mul(num, gfe.inv(den))
            out = gfe.add(gfe.mul(fin, bc1(shift, (n,))), q)
            return (out.re.lo, out.re.hi, out.im.lo, out.im.hi)

        fnq = _jit(("friquot", n), quotient_values_fn)
        shift = gfe.exp_const(alpha, npolys)
        out = fnq(comp.re.lo, comp.re.hi, comp.im.lo, comp.im.hi,
                  xs.lo, xs.hi,
                  z.re.lo, z.re.hi, z.im.lo, z.im.hi,
                  y.re.lo, y.re.hi, y.im.lo, y.im.hi,
                  final_values.re.lo, final_values.re.hi,
                  final_values.im.lo, final_values.im.hi,
                  shift.re.lo, shift.re.hi, shift.im.lo, shift.im.hi)
        final_values = gfe.GFE(gf.GF(out[0], out[1]), gf.GF(out[2], out[3]))

    # degree bump: F <- X * F (plonky2 PR #436): multiply values by x
    mulx = _jit(("frimulx", n),
                lambda r_lo, r_hi, i_lo, i_hi, x_lo, x_hi: tuple(
                    v for part in gfe.mul_base(
                        gfe.GFE(gf.GF(r_lo, r_hi), gf.GF(i_lo, i_hi)),
                        gf.GF(x_lo, x_hi))
                    for v in part))
    out = mulx(final_values.re.lo, final_values.re.hi,
               final_values.im.lo, final_values.im.hi, xs.lo, xs.hi)
    values = gfe.GFE(gf.GF(out[0], out[1]), gf.GF(out[2], out[3]))

    # coeffs via componentwise coset-iNTT
    from ..ntt import ntt as dntt

    def ifft2(r_lo, r_hi, i_lo, i_hi):
        c = dntt.coset_ifft(gf.GF(jnp.stack([r_lo, i_lo]),
                                  jnp.stack([r_hi, i_hi])))
        return c.lo, c.hi

    fn = _jit(("fri_ifft", n), ifft2)
    clo, chi = fn(values.re.lo, values.re.hi, values.im.lo, values.im.hi)
    coeffs = gfe.GFE(gf.GF(clo[0], chi[0]), gf.GF(clo[1], chi[1]))

    return fri_proof_device(
        oracles, coeffs, values, challenger, fri_config, degree_bits,
        hasher_kind, timing, mesh=mesh,
    )


def fri_proof_device(initial_oracles, coeffs: gfe.GFE, values: gfe.GFE,
                     challenger, config, degree_bits: int, hasher_kind: str,
                     timing, mesh=None) -> FriProof:
    import jax.numpy as jnp

    from ..hash.hashers import by_name
    from ..ntt import ntt as dntt

    hasher = by_name(hasher_kind)
    n = values.shape[0]
    arity_schedule = config.reduction_arity_bits(degree_bits)

    trees: list[_DeviceExtTree] = []
    shift = g.MULTIPLICATIVE_GROUP_GENERATOR
    for arity_bits in arity_schedule:
        arity = 1 << arity_bits
        tree = _DeviceExtTree(values, arity, config.cap_height, hasher_kind,
                              mesh=mesh)
        challenger.observe_cap(tree.cap, hasher)
        trees.append(tree)

        beta_host = challenger.get_extension_challenge()
        beta = gfe.from_u64_pair(beta_host)
        m = coeffs.shape[0]

        def fold_fn(c_rlo, c_rhi, c_ilo, c_ihi, b_rlo, b_rhi, b_ilo, b_ihi):
            # sum_i coeff_i * beta^i via log-depth powers + tree sum (NOT a
            # sequential Horner: >30 chained muls explodes XLA compile time,
            # round-4 finding); exact arithmetic, same result
            c = gfe.GFE(gf.GF(c_rlo, c_rhi), gf.GF(c_ilo, c_ihi))
            b = gfe.GFE(gf.GF(b_rlo, b_rhi), gf.GF(b_ilo, b_ihi))
            rl = c.re.lo.reshape(-1, arity)
            rh = c.re.hi.reshape(-1, arity)
            il = c.im.lo.reshape(-1, arity)
            ih = c.im.hi.reshape(-1, arity)
            bp = gfe.powers(b, arity)  # (arity,) beta^0..beta^{arity-1}

            def bc(e, _g=rl):
                # _g.shape[0] (not m//arity) so the same body is valid on a
                # per-device shard under shard_map
                return gfe.GFE(
                    gf.GF(jnp.broadcast_to(e.re.lo, (_g.shape[0],)),
                          jnp.broadcast_to(e.re.hi, (_g.shape[0],))),
                    gf.GF(jnp.broadcast_to(e.im.lo, (_g.shape[0],)),
                          jnp.broadcast_to(e.im.hi, (_g.shape[0],))),
                )

            terms = []
            for i in range(arity):
                term = gfe.GFE(gf.GF(rl[:, i], rh[:, i]),
                               gf.GF(il[:, i], ih[:, i]))
                terms.append(gfe.mul(term, bc(bp[i])))
            while len(terms) > 1:
                nxt = [gfe.add(terms[j], terms[j + 1])
                       for j in range(0, len(terms) - 1, 2)]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            acc = terms[0]
            return acc.re.lo, acc.re.hi, acc.im.lo, acc.im.hi

        if mesh is not None and (m // arity) % mesh.size == 0:
            # mesh-sharded fold (fri/prover.rs:72-124's par chunk loop):
            # contiguous coefficient groups are independent, so lanes are
            # row-sharded and beta replicated — same exact arithmetic
            import jax as _jax
            from jax.sharding import PartitionSpec as P

            from ..parallel.sharded import put_with_specs

            vec = P(tuple(mesh.axis_names))
            specs = (vec,) * 4 + (P(),) * 4
            sfn = _jax.jit(_jax.shard_map(
                fold_fn, mesh=mesh, in_specs=specs,
                out_specs=(vec,) * 4, check_vma=False))
            with mesh:
                out = sfn(*put_with_specs(
                    mesh,
                    (coeffs.re.lo, coeffs.re.hi, coeffs.im.lo, coeffs.im.hi,
                     beta.re.lo, beta.re.hi, beta.im.lo, beta.im.hi), specs))
        else:
            fn = _jit(("frifold", m, arity), fold_fn)
            out = fn(coeffs.re.lo, coeffs.re.hi, coeffs.im.lo, coeffs.im.hi,
                     beta.re.lo, beta.re.hi, beta.im.lo, beta.im.hi)
        coeffs = gfe.GFE(gf.GF(out[0], out[1]), gf.GF(out[2], out[3]))
        shift = pow(shift, arity, g.P)

        def refft(r_lo, r_hi, i_lo, i_hi, sh=shift):
            v = dntt.coset_fft(gf.GF(jnp.stack([r_lo, i_lo]),
                                     jnp.stack([r_hi, i_hi])), sh)
            return v.lo, v.hi

        fn2 = _jit(("fri_refft", coeffs.shape[0], shift), refft)
        vlo, vhi = fn2(coeffs.re.lo, coeffs.re.hi, coeffs.im.lo, coeffs.im.hi)
        values = gfe.GFE(gf.GF(vlo[0], vhi[0]), gf.GF(vlo[1], vhi[1]))

    # final polynomial coefficients to host (one fused pull)
    final_len = coeffs.shape[0] >> config.rate_bits
    fin = np.asarray(_jit(("finpoly", coeffs.shape[0], final_len),
                          lambda rl, rh, il, ih: jnp.stack(
                              [rl[:final_len], rh[:final_len],
                               il[:final_len], ih[:final_len]], axis=-1))(
        coeffs.re.lo, coeffs.re.hi, coeffs.im.lo, coeffs.im.hi),
        dtype=np.uint64)
    final_coeffs = np.stack(
        [fin[:, 0] | (fin[:, 1] << np.uint64(32)),
         fin[:, 2] | (fin[:, 3] << np.uint64(32))], axis=-1)
    for c in final_coeffs:
        challenger.observe_extension_element(c)

    # PoW grind on device (expected 2^pow_bits Poseidon permutations)
    current_hash = challenger.get_hash()
    pow_witness = fri_pow_device(current_hash, config)

    lde_n = 1 << (degree_bits + config.rate_bits)
    query_indices = [
        c % lde_n for c in challenger.get_n_challenges(config.num_query_rounds)
    ]

    # query extraction: every leaf/path gather stays on device and ONE
    # flattened u32 pull carries all of it to the host (the tunnel's D2H
    # latency made the round-2 ~20 pulls per table cost seconds each table)
    k = len(query_indices)
    dev_pieces = []  # (tag, meta, device u32 array)
    for o in initial_oracles:
        num_path_levels = o.lde_bits - config.cap_height
        dev_pieces.append(("leaves", o.num_polys,
                           o.query_leaves_dev(query_indices)))
        dev_pieces.append(("paths", num_path_levels,
                           gather_paths_dev(o.levels_dev, query_indices,
                                            num_path_levels)))
    xi = np.asarray(query_indices, dtype=np.int64)
    for i, arity_bits in enumerate(arity_schedule):
        coset = xi >> arity_bits
        tree = trees[i]
        dev_pieces.append(("frileaves", tree.arity,
                           tree.leaf_values_dev(coset)))
        dev_pieces.append(
            ("fripaths",
             log2_strict(tree.n_leaves) - tree.cap_height,
             tree.paths_dev(coset)))
        xi = coset

    arrs = [p[2] for p in dev_pieces]
    cat = _jit(("qpull", tuple(a.shape for a in arrs)),
               lambda xs: jnp.concatenate([x.reshape(-1) for x in xs]))
    flat = np.asarray(cat(tuple(arrs)), dtype=np.uint32)

    # host-side unpack
    off = 0
    leaves_per_oracle, paths_per_oracle = [], []
    steps_eval, steps_path = [], []
    for tag, meta, a in dev_pieces:
        size = int(np.prod(a.shape))
        buf = flat[off:off + size].reshape(a.shape)
        off += size
        if tag == "leaves":  # (k, C, 2) u32 -> (k, C) u64
            u = buf.astype(np.uint64)
            leaves_per_oracle.append(u[..., 0] | (u[..., 1] << np.uint64(32)))
        elif tag == "paths":  # (k, L, 8) u32 -> [k][L][4 u64]
            from .oracle_device import paths_to_host

            paths_per_oracle.append(paths_to_host(buf))
        elif tag == "frileaves":  # (k*arity, 4) u32 -> (k, arity, 2) u64
            u = buf.astype(np.uint64)
            re = u[:, 0] | (u[:, 1] << np.uint64(32))
            im = u[:, 2] | (u[:, 3] << np.uint64(32))
            steps_eval.append(
                np.stack([re, im], axis=-1).reshape(k, meta, 2))
        else:  # fripaths
            from .oracle_device import paths_to_host

            steps_path.append(paths_to_host(buf))

    query_rounds = []
    for qi in range(k):
        initial = FriInitialTreeProof(
            [
                ([int(v) for v in leaves_per_oracle[o][qi]],
                 paths_per_oracle[o][qi])
                for o in range(len(initial_oracles))
            ]
        )
        steps = [
            FriQueryStep(steps_eval[i][qi], steps_path[i][qi])
            for i in range(len(arity_schedule))
        ]
        query_rounds.append(FriQueryRound(initial, steps))

    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=query_rounds,
        final_poly=final_coeffs,
        pow_witness=pow_witness,
    )


# ---------------------------------------------------------------------------
# orchestration (mirrors stark/prover.py transcript exactly)
# ---------------------------------------------------------------------------


def _openings_device(trace_batch, zs_batch, quotient_batch, z_values: gf.GF,
                     zeta, gen: int, degree: int,
                     num_permutation_zs: int) -> StarkOpeningSet:
    """StarkOpeningSet::new (proof.rs:199-233): ONE fused device program
    evaluates every polynomial at zeta and g*zeta and slices the last CTL Z
    values; ONE (K, 4) u32 pull carries the whole opening set to the host
    (the per-column-chunk pulls of round 2 paid the tunnel's D2H latency
    ~15x per table)."""
    import jax.numpy as jnp

    nq = quotient_batch.coeffs.shape[1]
    Cq = quotient_batch.coeffs.shape[0]
    Ct = trace_batch.coeffs.shape[0]
    Cz = zs_batch.coeffs.shape[0]

    def fn(t_lo, t_hi, zc_lo, zc_hi, q_lo, q_hi, zv_lo, zv_hi,
           zr_lo, zr_hi, zi_lo, zi_hi):
        zeta_e = gfe.GFE(gf.GF(zr_lo, zr_hi), gf.GF(zi_lo, zi_hi))
        zeta_n = gfe.mul_base(zeta_e, gf.full((), gen))
        pows = gfe.powers(zeta_e, degree)
        pows_n = gfe.powers(zeta_n, degree)
        qpows = gfe.powers(zeta_e, nq)

        def ip(c: gf.GF, pw: gfe.GFE):
            re = gf.sum_reduce(gf.mul(c, pw.re[None, :]), -1)
            im = gf.sum_reduce(gf.mul(c, pw.im[None, :]), -1)
            return re, im

        outs = [
            ip(gf.GF(t_lo, t_hi), pows),
            ip(gf.GF(t_lo, t_hi), pows_n),
            ip(gf.GF(zc_lo, zc_hi), pows),
            ip(gf.GF(zc_lo, zc_hi), pows_n),
            ip(gf.GF(q_lo, q_hi), qpows),
            # ctl_zs_last: base values at g^{n-1} = last row of Z VALUES
            (gf.GF(zv_lo[num_permutation_zs:, -1],
                   zv_hi[num_permutation_zs:, -1]),
             gf.zeros((zv_lo.shape[0] - num_permutation_zs,))),
        ]
        re = gf.concatenate([o[0] for o in outs])
        im = gf.concatenate([o[1] for o in outs])
        return jnp.stack([re.lo, re.hi, im.lo, im.hi], axis=1)  # (K, 4) u32

    zeta_dev = gfe.from_u64_pair(np.asarray(zeta, dtype=np.uint64))
    key = ("openings", trace_batch.coeffs.shape, zs_batch.coeffs.shape,
           quotient_batch.coeffs.shape, num_permutation_zs, gen)
    out = np.asarray(_jit(key, fn)(
        trace_batch.coeffs.lo, trace_batch.coeffs.hi,
        zs_batch.coeffs.lo, zs_batch.coeffs.hi,
        quotient_batch.coeffs.lo, quotient_batch.coeffs.hi,
        z_values.lo, z_values.hi,
        zeta_dev.re.lo, zeta_dev.re.hi, zeta_dev.im.lo, zeta_dev.im.hi,
    ), dtype=np.uint64)
    re = out[:, 0] | (out[:, 1] << np.uint64(32))
    im = out[:, 2] | (out[:, 3] << np.uint64(32))
    ext = np.stack([re, im], axis=-1)  # (K, 2) u64

    o = 0
    local_values = ext[o:o + Ct]; o += Ct
    next_values = ext[o:o + Ct]; o += Ct
    perm_ctl_zs = ext[o:o + Cz]; o += Cz
    perm_ctl_zs_next = ext[o:o + Cz]; o += Cz
    quotient_polys_open = ext[o:o + Cq]; o += Cq
    ctl_zs_last = re[o:]
    return StarkOpeningSet(
        local_values, next_values, perm_ctl_zs, perm_ctl_zs_next,
        ctl_zs_last, quotient_polys_open,
    )


def prove_single_table_device(stark, config, trace_values: gf.GF,
                              trace_batch: DevicePolynomialBatch,
                              ctl_data, challenger, timing,
                              table_name: str = "?",
                              oracle=DevicePolynomialBatch) -> StarkProof:
    import jax.numpy as jnp

    degree = trace_values.shape[1]
    degree_bits = log2_strict(degree)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    hasher_kind = config.merkle_hasher
    hasher = config.hasher()
    total_arities = sum(config.fri_config.reduction_arity_bits(degree_bits))
    assert total_arities <= degree_bits + rate_bits - cap_height
    # a mesh-backed oracle (parallel.sharded.ShardedOracle) also shards the
    # quotient classes, FRI folds and FRI trees over its mesh
    mesh = getattr(oracle, "mesh", None)

    challenger.compact()

    _log_hbm(f"table {table_name} start")
    permutation_challenges = None
    permutation_zs: list[gf.GF] = []
    if stark.uses_permutation_args():
        permutation_challenges = get_n_grand_product_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size()
        )
        with timing.scope("permutation Z polys"):
            permutation_zs = permutation_z_polys_device(
                stark, config, trace_values, permutation_challenges
            )
    num_permutation_zs = len(permutation_zs)

    z_list = list(permutation_zs) + [zc.z for zc in ctl_data.zs_columns]
    assert z_list, "No CTL?"
    z_values = gf.GF(
        jnp.stack([z.lo for z in z_list]),
        jnp.stack([z.hi for z in z_list]),
    )

    with timing.scope("Z commitment"):
        zs_batch = oracle.from_values(
            z_values, rate_bits, cap_height, hasher_kind
        )
    challenger.observe_cap(zs_batch.cap, hasher)

    alphas = challenger.get_n_challenges(config.num_challenges)

    with timing.scope("compute quotient polys"):
        quotient_coeffs = compute_quotient_polys_device(
            stark, config, trace_batch, zs_batch, permutation_challenges,
            ctl_data, alphas, degree_bits, num_permutation_zs, mesh=mesh,
        )
    _log_hbm(f"table {table_name} quotient")

    with timing.scope("quotient commitment"):
        quotient_batch = oracle.from_coeffs(
            quotient_coeffs, rate_bits, cap_height, hasher_kind
        )
    challenger.observe_cap(quotient_batch.cap, hasher)

    zeta = challenger.get_extension_challenge()
    if ge.is_one(ge.exp_pow2(zeta, degree_bits)):
        raise ValueError("opening point is in the subgroup")
    gen = g.primitive_root_of_unity(degree_bits)

    with timing.scope("openings"):
        openings = _openings_device(
            trace_batch, zs_batch, quotient_batch, z_values, zeta, gen,
            degree, num_permutation_zs,
        )

    openings_batches = openings.to_fri_openings()
    for batch in openings_batches:
        challenger.observe_extension_elements(batch)

    instance = fri_instance_for_stark(
        stark, zeta, gen, degree_bits, len(ctl_data), config
    )

    with timing.scope("FRI opening proof"):
        opening_proof = prove_openings_device(
            instance, openings_batches,
            [trace_batch, zs_batch, quotient_batch],
            challenger, config, degree_bits, hasher_kind, timing, mesh=mesh,
        )
    _log_hbm(f"table {table_name} fri")

    # free this table's big buffers before the next table
    caps = (trace_batch.cap, zs_batch.cap, quotient_batch.cap)
    trace_batch.free()
    zs_batch.free()
    quotient_batch.free()

    return StarkProof(
        trace_cap=caps[0],
        permutation_ctl_zs_cap=caps[1],
        quotient_polys_cap=caps[2],
        openings=openings,
        opening_proof=opening_proof,
    )


def prove_with_traces_device(ola_stark, config: StarkConfig,
                             trace_poly_values: list[np.ndarray],
                             public_values: PublicValues | None = None,
                             timing: TimingTree | None = None,
                             oracle=DevicePolynomialBatch) -> AllProof:
    """Device analogue of prover.prove_with_traces: same challenger
    transcript, all heavy phases on the accelerator. trace_poly_values:
    per table (num_cols, degree) uint64 host arrays (uploaded once)."""
    import jax.numpy as jnp

    timing = timing or TimingTree()
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    hasher_kind = config.merkle_hasher
    hasher = config.hasher()

    with timing.scope("upload traces"):
        values_dev = [gf.from_u64(np.asarray(t, dtype=np.uint64))
                      for t in trace_poly_values]

    with timing.scope("compute trace commitments"):
        trace_batches = []
        for ti, v in enumerate(values_dev):
            logger.info("trace commit %d/%d shape=%s", ti + 1,
                        len(values_dev), v.shape)
            trace_batches.append(
                oracle.from_values(v, rate_bits, cap_height,
                                                  hasher_kind,
                                                  defer_cap_pull=True)
            )
        # one fused D2H pull for all 12 caps (vs 12 latency-bound pulls);
        # oracles that already resolved their caps (ShardedOracle) skip it
        from ..merkle.device import stack_lanes_device

        deferred = [b for b in trace_batches if isinstance(b._cap, list)]
        if deferred:
            all_caps = _jit(("allcaps", len(deferred), cap_height),
                            lambda *ls: jnp.concatenate(ls, axis=0))(
                *[stack_lanes_device(b.cap_lanes_device) for b in deferred])
            caps_np = np.ascontiguousarray(
                np.asarray(all_caps, dtype=np.uint32)
            ).view(np.uint64).reshape(len(deferred), -1, 4)
            for b, c in zip(deferred, caps_np):
                b._cap = c
    _log_hbm("trace commitments")

    challenger = Challenger()
    for b in trace_batches:
        challenger.observe_cap(b.cap, hasher)

    with timing.scope("cross_table_lookup_data"):
        ctl_data_per_table = ctl_data_device(
            config, values_dev, ola_stark.cross_table_lookups, challenger
        )

    stark_proofs = []
    for idx, stark in enumerate(ola_stark.starks):
        logger.info("prove table %d/%d (%s)", idx + 1,
                    len(ola_stark.starks), type(stark).__name__)
        with timing.scope(f"prove table {idx}"):
            proof = prove_single_table_device(
                stark, config, values_dev[idx], trace_batches[idx],
                ctl_data_per_table[idx], challenger, timing,
                table_name=str(idx), oracle=oracle,
            )
        stark_proofs.append(proof)
        # free everything only this table needed (values, ctl Z arrays)
        values_dev[idx] = None
        ctl_data_per_table[idx] = None

    return AllProof(
        stark_proofs=stark_proofs,
        compress_challenges=ola_stark.compress_challenges(),
        public_values=public_values or PublicValues(),
    )
