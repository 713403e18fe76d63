"""Poseidon permutation/sponge over an arbitrary prime field (host).

TPU-native-equivalent of the ecdsa-pop/neptune fork (SURVEY.md §2b): the
device-binding proof hashes the split device public key h_Q =
Poseidon(q0, q1, z) over T-256's scalar field (= P-256's base field), one
hash per proof — host-side is the right place.

Parameters follow the Poseidon reference construction: x^5 S-box, R_F=8
full rounds, R_P partial rounds per the 128-bit-security tables, round
constants from the canonical Grain-LFSR generator, MDS = Cauchy matrix
1/(x_i + y_j).  NOTE: neptune additionally applies its own constant
pre-processing for the optimized evaluation order; byte-parity with the
reference's neptune fork is tracked in PARITY.md (self-consistency between
our prover and verifier is what the protocol needs).
"""

from __future__ import annotations

import functools
import math


class GrainLFSR:
    """Canonical Poseidon Grain-LFSR for round-constant generation."""

    def __init__(self, field_bits: int, t: int, r_f: int, r_p: int):
        state = []
        def add_bits(value, n):
            for i in range(n - 1, -1, -1):
                state.append((value >> i) & 1)
        add_bits(1, 2)            # field = prime
        add_bits(0, 4)            # sbox x^alpha
        add_bits(field_bits, 12)  # field size
        add_bits(t, 12)
        add_bits(r_f, 10)
        add_bits(r_p, 10)
        add_bits((1 << 30) - 1, 30)
        self.state = state
        assert len(state) == 80
        # discard 160 bits
        for _ in range(160):
            self._next_bit()

    def _next_bit(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0)
        s.append(new)
        return new

    def next_filtered_bit(self) -> int:
        while True:
            b1 = self._next_bit()
            b2 = self._next_bit()
            if b1:
                return b2

    def next_field_element(self, p: int, field_bits: int) -> int:
        while True:
            v = 0
            for _ in range(field_bits):
                v = (v << 1) | self.next_filtered_bit()
            if v < p:
                return v


def round_numbers(t: int) -> tuple[int, int]:
    """(R_F, R_P) for x^5, 128-bit security, ~255-bit fields (Poseidon
    paper tables; matches neptune's round_numbers for these widths)."""
    r_f = 8
    r_p = {2: 55, 3: 55, 4: 56, 5: 56, 6: 56, 7: 56, 8: 57, 9: 57}.get(t, 57)
    return r_f, r_p


class Poseidon:
    def __init__(self, p: int, t: int, r_f: int | None = None, r_p: int | None = None):
        self.p = p
        self.t = t
        self.field_bits = p.bit_length()
        rf, rp = round_numbers(t)
        self.r_f = r_f or rf
        self.r_p = r_p or rp
        # NOTE: x^5 is only a bijection when gcd(5, p-1) == 1; over P-256's
        # base field gcd == 5, yet the reference's neptune fork applies the
        # quintic S-box there regardless (ecdsa-pop/src/lib.rs:36).  We match
        # that behavior — the sponge stays computable either way.

        g = GrainLFSR(self.field_bits, t, self.r_f, self.r_p)
        n_consts = t * (self.r_f + self.r_p)
        self.round_constants = [g.next_field_element(p, self.field_bits) for _ in range(n_consts)]
        # MDS: Cauchy matrix M[i][j] = 1/(x_i + y_j), x_i = i, y_j = t + j
        self.mds = [
            [pow((i + (t + j)) % p, -1, p) for j in range(t)] for i in range(t)
        ]

    def _sbox(self, x: int) -> int:
        return pow(x, 5, self.p)

    def permutation(self, state: list[int]) -> list[int]:
        p, t = self.p, self.t
        assert len(state) == t
        state = [x % p for x in state]
        rc = iter(self.round_constants)
        half = self.r_f // 2

        def full_round(state):
            state = [(x + next(rc)) % p for x in state]
            state = [self._sbox(x) for x in state]
            return self._mix(state)

        def partial_round(state):
            state = [(x + next(rc)) % p for x in state]
            state = [self._sbox(state[0])] + state[1:]
            return self._mix(state)

        for _ in range(half):
            state = full_round(state)
        for _ in range(self.r_p):
            state = partial_round(state)
        for _ in range(half):
            state = full_round(state)
        return state

    def _mix(self, state: list[int]) -> list[int]:
        p = self.p
        return [
            sum(self.mds[i][j] * state[j] for j in range(self.t)) % p
            for i in range(self.t)
        ]

    def hash(self, inputs: list[int]) -> int:
        """Fixed-arity sponge: state = [0, inputs...], one permutation,
        output element 1 (neptune's hash convention for arity t-1)."""
        assert len(inputs) == self.t - 1
        state = [0] + [x % self.p for x in inputs]
        return self.permutation(state)[1]


@functools.lru_cache(maxsize=None)
def get_poseidon(p: int, t: int) -> Poseidon:
    return Poseidon(p, t)
