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

TILE = 256      # default lanes per tile (batch elements per grid row)
CHUNK = 512     # instructions per SMEM block (8 KB)

# VMEM register-file budget note: the kernel holds K x (l_pad, tile) int32
# registers in VMEM plus only the entry rows in and output rows out (NOT
# three full register files) — E24/BW6 programs with hundreds of live
# GT coefficients stay compilable by shrinking `tile` per program
# (vm_pairing._TILE) rather than failing Mosaic at 15+ MB.

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

def _vm_kernel(spec: FieldSpec, l_pad: int, K: int, n_entry: int,
               n_out: int, tile: int, interpret: bool,
               code_ref, omap_ref, in_ref, q_ref, out_ref, regs):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    q_col = q_ref[:]

    @pl.when(c == 0)
    def _():
        regs[pl.ds(0, n_entry)] = in_ref[:]

    def op_mul(a, b, _s):
        return _mm_tile(spec, l_pad, a, b, q_col)

    def op_add(a, b, _s):
        return _add_tile(spec, l_pad, a, b, q_col)

    def op_sub(a, b, _s):
        return _sub_tile(spec, l_pad, a, b, q_col)

    def op_halve(a, _b, _s):
        return _halve_tile(spec, l_pad, a, q_col)

    def op_rot(a, _b, s):
        # lane i receives lane (i+s) mod tile; shift kept positive (a
        # traced negative shift is sign-ambiguous for pltpu.roll)
        if interpret:
            return jnp.roll(a, tile - s, axis=1)
        return pltpu.roll(a, tile - s, axis=1)

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
        def cp(i, _):
            out_ref[pl.ds(i, 1)] = regs[pl.ds(omap_ref[i], 1)]
            return 0
        jax.lax.fori_loop(0, n_out, cp, 0)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8))
def _vm_call(spec: FieldSpec, code, omap, state, K: int, n_entry: int,
             l_pad: int, tile: int, interpret: bool = False):
    """Run a padded (n_chunks*CHUNK, 4) program over entry state
    (n_entry, l_pad, n_pad); returns (n_out, l_pad, n_pad) output rows."""
    n_chunks = code.shape[0] // CHUNK
    n_pad = state.shape[2]
    n_out = omap.shape[0]
    T = n_pad // tile
    qt = np.broadcast_to(np.asarray(
        spec.q_limbs + (0,) * (l_pad - spec.n_limbs),
        np.int32)[:, None], (l_pad, tile)).copy()
    kern = functools.partial(_vm_kernel, spec, l_pad, K, n_entry, n_out,
                             tile, interpret)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_out, l_pad, n_pad), jnp.int32),
        grid=(T, n_chunks),
        in_specs=[
            pl.BlockSpec((CHUNK, 4), lambda t, c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_out,), lambda t, c: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_entry, l_pad, tile), lambda t, c: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, tile), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, l_pad, tile), lambda t, c: (0, 0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, l_pad, tile), jnp.int32)],
        interpret=interpret,
    )(code, omap, state, jnp.asarray(qt))


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
    tile: int = TILE                 # lanes per grid tile
    n_entry: int = 0                 # entry rows = phys regs [0, n_entry)


class Asm:
    """SSA instruction emitter for one field spec.

    Values are integer SSA ids. ``input``/``const`` define entry values;
    ``mul/add/sub/halve/rot`` emit instructions. ``build`` performs
    liveness analysis + greedy register allocation (auto-sized to the peak
    live count) and returns a :class:`Program`.

    ``tile``: lanes per VM grid tile — the semantic width of ``rot``
    (cross-lane product trees span exactly one tile).
    """

    def __init__(self, spec: FieldSpec, tile: int = TILE):
        self.spec = spec
        self.tile = tile
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
        assert 0 < lanes < self.tile
        d = self._new()
        self.code.append((OP_ROT, d, a, -lanes))  # negative marks immediate
        return d

    def build(self, outputs: dict[str, int], max_regs: int = 1024) -> Program:
        """Dead-code-eliminate, allocate physical registers (auto-sized to
        peak-live + 1 NOP-dump row; raises past the ``max_regs`` cap) and
        return the padded Program."""
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
        free: list[int] = list(range(max_regs - 1, -1, -1))

        def alloc(v):
            if not free:
                raise RuntimeError(
                    f"register spill: >{max_regs} live values")
            phys[v] = free.pop()

        # entry values live from position -1; allocated first, so they land
        # in contiguous registers [0, n_entry) — the kernel loads the input
        # block with one static-slice write
        entry_vals = [v for v, _ in self._inputs] + \
            list(self._consts.values())
        for v in entry_vals:
            alloc(v)
        n_entry = len(entry_vals)
        assert [phys[v] for v in entry_vals] == list(range(n_entry))
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
        # auto-size the register file: peak-live + 1 NOP-dump row
        peak = max(phys.values(), default=0)
        dump = peak + 1
        n_chunks = max(1, -(-n // CHUNK))
        padded = np.full((n_chunks * CHUNK, 4),
                         (OP_NOP, dump, dump, dump), np.int32)
        padded[:n] = out[:n]
        return Program(
            spec=self.spec,
            code=padded,
            n_regs=dump + 1,
            entry_consts=tuple(sorted(
                (phys[v], val) for val, v in self._consts.items())),
            entry_inputs=tuple((phys[v], name) for v, name in self._inputs),
            out_regs=tuple((name, phys[v]) for name, v in outputs.items()),
            n_instrs=n,
            tile=self.tile,
            n_entry=n_entry,
        )


# ---------------------------------------------------------------------------
# host-side program execution
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _entry_const_cols(prog: Program, l_pad: int):
    """(n_entry, l_pad) int32 column of Montgomery-form entry constants."""
    spec = prog.spec
    cols = np.zeros((prog.n_entry, l_pad), np.int32)
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
    n_pad = _round_up(max(n, 1), prog.tile)
    K = prog.n_regs

    cols = _entry_const_cols(prog, l_pad)
    state = jnp.broadcast_to(
        jnp.asarray(cols)[:, :, None], (prog.n_entry, l_pad, n_pad))
    for reg, name in prog.entry_inputs:
        x = inputs[name]
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None, :], (n, L))
        pad = jnp.zeros((l_pad, n_pad), jnp.int32).at[:L, :n].set(x.T)
        state = state.at[reg].set(pad)

    omap = jnp.asarray([reg for _, reg in prog.out_regs], jnp.int32)
    out = _vm_call(spec, jnp.asarray(prog.code), omap, state, K,
                   prog.n_entry, l_pad, prog.tile, interpret)
    return {name: out[i, :L, :n].T
            for i, (name, _reg) in enumerate(prog.out_regs)}
