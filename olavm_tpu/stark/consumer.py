"""ConstraintConsumer (circuits/src/stark/constraint_consumer.rs:10-78):
accumulates constraints scaled by powers of alpha, with first/last/transition
row selectors. Works with either BaseOps (vectorized) or ExtOps values."""

from __future__ import annotations


class ConstraintConsumer:
    def __init__(self, F, alphas, z_last, lagrange_first, lagrange_last):
        """alphas: list of values in the SAME representation as constraints
        (base arrays broadcastable, or ext elements)."""
        self.F = F
        self.alphas = alphas
        self.accs = [F.constant(0) for _ in alphas]
        self.z_last = z_last
        self.lagrange_first = lagrange_first
        self.lagrange_last = lagrange_last

    def constraint(self, c):
        F = self.F
        for i, alpha in enumerate(self.alphas):
            self.accs[i] = F.add(F.mul(self.accs[i], alpha), c)

    def constraint_transition(self, c):
        self.constraint(self.F.mul(c, self.z_last))

    def constraint_first_row(self, c):
        self.constraint(self.F.mul(c, self.lagrange_first))

    def constraint_last_row(self, c):
        self.constraint(self.F.mul(c, self.lagrange_last))

    def accumulators(self):
        return self.accs
