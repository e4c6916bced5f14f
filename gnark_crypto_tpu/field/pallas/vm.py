"""Pallas TPU kernel: a straight-line-program executor for field arithmetic.

The pairing (and every other deep sequential chain of extension-field ops)
cannot be expressed efficiently in either of the two existing tiers:

  * one jitted XLA program per step is dispatch-bound through the tunnel
    (~1500 round trips for a full pairing, measured 106 pairs/s), and a
    whole-pairing XLA graph OOM-kills the remote compile helper
    (PERF.md round 3, finding 5);
  * a fully unrolled Pallas kernel of the whole loop would take an hour of
    Mosaic compile (instruction count scales with unrolled mul count).

This module takes the third road, the TPU-native analogue of the
reference's generated straight-line assembly (``field/asm/element_4w``,
``e12_pairing.go`` addchains): a **fixed, small kernel** that interprets a
**program** — an ``(op, dst, a, b)`` int32 instruction stream — over a
VMEM register file of ``(l_pad, TILE)`` fp-limb tiles (limbs in sublanes,
elements/batch in lanes, same layout as ``mont_mul.py``). The program is
*data*: one Mosaic compile per (field, shape bucket) serves every curve
formula, and a 100k-instruction pairing runs as ONE device dispatch.

Ops:
  MUL   d = a * b          (Montgomery CIOS, shared with mont_mul._mm_tile)
  ADD   d = a + b mod q
  SUB   d = a - b mod q
  HALVE d = a / 2 mod q    (reference element.go:367 Halve)
  ROT   d = lanes(a) rotated down by `b` (cross-lane: product trees)
  NOP   padding

Programs are built with :class:`Asm` (SSA emission + linear-scan register
allocation); the symbolic tower/pairing builders live in
``towers/symbolic.py`` / ``pairing/vm_pairing.py``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnark_crypto_tpu.field.pallas.mont_mul import (_add_tile, _carry_rows,
                                                    _mm_tile, _round_up,
                                                    _sub_tile)
from gnark_crypto_tpu.specs.field import FieldSpec, int_to_limbs

TILE = 256      # lanes per tile (batch elements per grid row)
CHUNK = 512     # instructions per SMEM block (8 KB)

OP_MUL, OP_ADD, OP_SUB, OP_HALVE, OP_ROT, OP_NOP = range(6)


def _halve_tile(spec: FieldSpec, l_pad: int, x, q_col):
    """x/2 mod q on a canonical (l_pad, TILE) tile (element.go:367)."""
    b = spec.limb_bits
    # x + q < 2q needs one extra bit of headroom: either spare zero rows
    # above L absorb the carry, or (when L == l_pad, e.g. bls12-381/377 at
    # 32 limbs) the top limb itself has slack because 2q < 2^(l_pad*b).
    assert 2 * spec.modulus < 1 << (l_pad * b), spec.name
    odd = x[0:1, :] & 1
    t = x + jnp.where(odd == 1, q_col, 0)
    t, _ = _carry_rows(t, l_pad, b, spec.mask)
    hi = jnp.concatenate([t[1:], t[0:1] ^ t[0:1]], axis=0)
    return (t >> 1) | ((hi & 1) << (b - 1))


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _vm_kernel(spec: FieldSpec, l_pad: int, K: int, interpret: bool,
               code_ref, in_ref, q_ref, out_ref, regs):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    q_col = q_ref[:]

    @pl.when(c == 0)
    def _():
        regs[:] = in_ref[:]

    def op_mul(a, b, _s):
        return _mm_tile(spec, l_pad, a, b, q_col)

    def op_add(a, b, _s):
        return _add_tile(spec, l_pad, a, b, q_col)

    def op_sub(a, b, _s):
        return _sub_tile(spec, l_pad, a, b, q_col)

    def op_halve(a, _b, _s):
        return _halve_tile(spec, l_pad, a, q_col)

    def op_rot(a, _b, s):
        # lane i receives lane (i+s) mod TILE; shift kept positive (a
        # traced negative shift is sign-ambiguous for pltpu.roll)
        if interpret:
            return jnp.roll(a, TILE - s, axis=1)
        return pltpu.roll(a, TILE - s, axis=1)

    def op_nop(a, _b, _s):
        return a

    def step(i, _):
        op = code_ref[i, 0]
        d = code_ref[i, 1]
        a = code_ref[i, 2]
        b = code_ref[i, 3]
        va = regs[pl.ds(a, 1)][0]
        vb = regs[pl.ds(jnp.minimum(b, K - 1), 1)][0]
        res = jax.lax.switch(
            op, [op_mul, op_add, op_sub, op_halve, op_rot, op_nop],
            va, vb, b)
        regs[pl.ds(d, 1)] = res[None]
        return 0

    jax.lax.fori_loop(0, CHUNK, step, 0)

    @pl.when(c == nc - 1)
    def _():
        out_ref[:] = regs[:]


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _vm_call(spec: FieldSpec, code, state, K: int, l_pad: int,
             interpret: bool = False):
    """Run a padded (n_chunks*CHUNK, 4) program over (K, l_pad, n_pad)."""
    n_chunks = code.shape[0] // CHUNK
    n_pad = state.shape[2]
    T = n_pad // TILE
    qt = np.broadcast_to(np.asarray(
        spec.q_limbs + (0,) * (l_pad - spec.n_limbs),
        np.int32)[:, None], (l_pad, TILE)).copy()
    kern = functools.partial(_vm_kernel, spec, l_pad, K, interpret)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, l_pad, n_pad), jnp.int32),
        grid=(T, n_chunks),
        in_specs=[
            pl.BlockSpec((CHUNK, 4), lambda t, c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, l_pad, TILE), lambda t, c: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, TILE), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, l_pad, TILE), lambda t, c: (0, 0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, l_pad, TILE), jnp.int32)],
        interpret=interpret,
    )(code, state, jnp.asarray(qt))


# ---------------------------------------------------------------------------
# SSA assembler + linear-scan register allocation
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)  # identity eq/hash: programs
class Program:                                 # are built once and cached
    spec: FieldSpec
    code: np.ndarray                 # (n_chunks*CHUNK, 4) int32, phys regs
    n_regs: int                      # K (allocated register-file height)
    entry_consts: tuple              # ((phys_reg, int_value_plain), ...)
    entry_inputs: tuple              # ((phys_reg, input_name), ...)
    out_regs: tuple                  # ((name, phys_reg), ...)
    n_instrs: int                    # before NOP padding


class Asm:
    """SSA instruction emitter for one field spec.

    Values are integer SSA ids. ``input``/``const`` define entry values;
    ``mul/add/sub/halve/rot`` emit instructions. ``build`` performs
    liveness analysis + greedy register allocation into K physical
    registers and returns a :class:`Program`.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.code: list[tuple] = []   # (op, dst_ssa, a_ssa, b_ssa_or_imm)
        self.n_vals = 0
        self._inputs: list[tuple] = []   # (ssa, name)
        self._consts: dict[int, int] = {}  # value -> ssa

    def _new(self) -> int:
        v = self.n_vals
        self.n_vals += 1
        return v

    def input(self, name: str) -> int:
        v = self._new()
        self._inputs.append((v, name))
        return v

    def const(self, value: int) -> int:
        value %= self.spec.modulus
        if value not in self._consts:
            self._consts[value] = self._new()
        return self._consts[value]

    def _emit(self, op, a, b) -> int:
        d = self._new()
        self.code.append((op, d, a, b))
        return d

    def mul(self, a, b):
        return self._emit(OP_MUL, a, b)

    def add(self, a, b):
        return self._emit(OP_ADD, a, b)

    def sub(self, a, b):
        return self._emit(OP_SUB, a, b)

    def halve(self, a):
        return self._emit(OP_HALVE, a, a)

    def rot(self, a, lanes: int):
        assert 0 < lanes < TILE
        d = self._new()
        self.code.append((OP_ROT, d, a, -lanes))  # negative marks immediate
        return d

    def build(self, outputs: dict[str, int], max_regs: int = 128) -> Program:
        """Dead-code-eliminate, allocate physical registers (≤ max_regs;
        reg max_regs-1 is the NOP dump) and return the padded Program."""
        # DCE: formulas emit values that end up unused (trailing line
        # coefficients, the final point coordinates, ...)
        live = set(outputs.values())
        keep = [False] * len(self.code)
        for pos in range(len(self.code) - 1, -1, -1):
            op, d, a, b = self.code[pos]
            if d in live:
                keep[pos] = True
                live.discard(d)
                live.add(a)
                if op != OP_ROT:
                    live.add(b)
        self.code = [ins for ins, k in zip(self.code, keep) if k]
        self._inputs = [(v, n) for v, n in self._inputs if v in live]
        self._consts = {val: v for val, v in self._consts.items()
                        if v in live}

        last_use = {}
        for pos, (op, d, a, b) in enumerate(self.code):
            last_use[a] = pos
            if op != OP_ROT and b >= 0:
                last_use[b] = pos
        for v in outputs.values():
            last_use[v] = len(self.code)  # live to the end

        phys = {}
        free: list[int] = list(range(max_regs - 2, -1, -1))  # reg K-1 = dump

        def alloc(v):
            if not free:
                raise RuntimeError(
                    f"register spill: >{max_regs - 1} live values")
            phys[v] = free.pop()

        # entry values live from position -1
        entry_vals = [v for v, _ in self._inputs] + \
            list(self._consts.values())
        for v in entry_vals:
            alloc(v)
        # free entry values that are never used
        expiring: dict[int, list[int]] = {}
        for v in entry_vals:
            expiring.setdefault(last_use[v], []).append(v)

        out = np.zeros((max(len(self.code), 1), 4), np.int32)
        for pos, (op, d, a, b) in enumerate(self.code):
            pa = phys[a]
            if op == OP_ROT:
                pb = -b  # immediate lane shift
            else:
                pb = phys[b]
            # free operands whose last use is this instruction BEFORE
            # allocating d (d may reuse a's register: in-place ok — every
            # op reads operands fully before writing the destination)
            for v in expiring.pop(pos, []):
                free.append(phys[v])
            alloc(d)
            expiring.setdefault(last_use[d], []).append(d)
            out[pos] = (op, phys[d], pa, pb)

        n = len(self.code)
        n_chunks = max(1, -(-n // CHUNK))
        padded = np.full((n_chunks * CHUNK, 4),
                         (OP_NOP, max_regs - 1, max_regs - 1, max_regs - 1),
                         np.int32)
        padded[:n] = out[:n]
        return Program(
            spec=self.spec,
            code=padded,
            n_regs=max_regs,
            entry_consts=tuple(sorted(
                (phys[v], val) for val, v in self._consts.items())),
            entry_inputs=tuple((phys[v], name) for v, name in self._inputs),
            out_regs=tuple((name, phys[v]) for name, v in outputs.items()),
            n_instrs=n,
        )


# ---------------------------------------------------------------------------
# host-side program execution
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _entry_const_cols(prog: Program, l_pad: int):
    """(K, l_pad) int32 column of Montgomery-form constants at entry."""
    spec = prog.spec
    cols = np.zeros((prog.n_regs, l_pad), np.int32)
    for reg, val in prog.entry_consts:
        vm = val * spec.r % spec.modulus
        cols[reg, :spec.n_limbs] = np.asarray(
            int_to_limbs(vm, spec.limb_bits, spec.n_limbs), np.int32)
    return cols


def execute(prog: Program, inputs: dict, n: int, interpret: bool = False):
    """Run a Program over batched inputs.

    inputs: name -> (n, L) int32 Montgomery limb arrays (or (L,) applied
    broadcast). Returns name -> (n, L) arrays for prog.out_regs.
    """
    spec = prog.spec
    L = spec.n_limbs
    l_pad = _round_up(max(L, 8), 8)
    n_pad = _round_up(max(n, 1), TILE)
    K = prog.n_regs

    cols = _entry_const_cols(prog, l_pad)
    state = jnp.broadcast_to(
        jnp.asarray(cols)[:, :, None], (K, l_pad, n_pad))
    for reg, name in prog.entry_inputs:
        x = inputs[name]
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None, :], (n, L))
        pad = jnp.zeros((l_pad, n_pad), jnp.int32).at[:L, :n].set(x.T)
        state = state.at[reg].set(pad)

    out = _vm_call(spec, jnp.asarray(prog.code), state, K, l_pad, interpret)
    return {name: out[reg, :L, :n].T for name, reg in prog.out_regs}
