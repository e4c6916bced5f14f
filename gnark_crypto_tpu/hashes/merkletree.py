"""Streaming Merkle tree accumulator with single-index proofs.

Behavioral port of ``accumulator/merkletree/tree.go`` (Sia-derived; the
reference disables the 0x00/0x01 domain prefixes — tree.go:92-104 — so
leafSum = H(data), nodeSum = H(a || b)). Host-side control flow: the hash can
be any hashlib-like factory, including the device-batched MiMC/Poseidon2
hashers via their update/digest facade.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


def _sum(hfac, *chunks: bytes) -> bytes:
    h = hfac()
    for c in chunks:
        h.update(c)
    return h.digest()


@dataclass
class _SubTree:
    height: int
    sum: bytes
    next: "_SubTree | None" = None


class Tree:
    """Streaming accumulator: keeps O(log n) subtree roots (tree.go:36)."""

    def __init__(self, hfac=hashlib.sha256):
        self._h = hfac
        self.head: _SubTree | None = None
        self.current_index = 0
        self.proof_index = None
        self.proof_set: list[bytes] = []

    # -- hashing ------------------------------------------------------------
    def _leaf_sum(self, data: bytes) -> bytes:
        return _sum(self._h, data)

    def _node_sum(self, a: bytes, b: bytes) -> bytes:
        return _sum(self._h, a, b)

    # -- API (tree.go Push/SetIndex/Root/Prove) -----------------------------
    def set_index(self, i: int):
        if self.head is not None:
            raise ValueError("cannot call set_index on a non-empty tree")
        self.proof_index = i

    def push(self, data: bytes):
        if self.current_index == self.proof_index:
            self.proof_set.append(data)
        self.head = _SubTree(0, self._leaf_sum(data), self.head)
        self._join_all()
        self.current_index += 1

    def push_subtree(self, height: int, sum_: bytes):
        """tree.go:254 PushSubTree (cached subtree roots)."""
        new_index = self.current_index + (1 << height)
        if self.proof_index is not None and (
                self.current_index == self.proof_index or
                self.current_index < self.proof_index < new_index):
            raise ValueError("cached subtree must not contain the proof index")
        if self.head is not None and self.head.height < height:
            raise ValueError("subtree too large for the current stack")
        self.head = _SubTree(height, sum_, self.head)
        self._join_all()
        self.current_index = new_index

    def _join_all(self):
        while (self.head.next is not None
               and self.head.height == self.head.next.height):
            if self.head.height == len(self.proof_set) - 1:
                leaves = 1 << self.head.height
                mid = (self.current_index // leaves) * leaves
                if self.proof_index < mid:
                    self.proof_set.append(self.head.sum)
                else:
                    self.proof_set.append(self.head.next.sum)
            nxt = self.head.next
            self.head = _SubTree(nxt.height + 1,
                                 self._node_sum(nxt.sum, self.head.sum),
                                 nxt.next)

    def root(self) -> bytes | None:
        if self.head is None:
            return None
        cur = self.head
        while cur.next is not None:
            cur = _SubTree(cur.next.height + 1,
                           self._node_sum(cur.next.sum, cur.sum),
                           cur.next.next)
        return cur.sum

    def prove(self):
        """-> (root, proof_set, proof_index, num_leaves) (tree.go:137)."""
        if self.proof_index is None:
            raise ValueError("set_index was not called")
        if self.head is None or not self.proof_set:
            return self.root(), None, self.proof_index, self.current_index
        proof_set = list(self.proof_set)
        current = self.head
        while (current.next is not None
               and current.next.height < len(proof_set) - 1):
            nxt = current.next
            current = _SubTree(nxt.height + 1,
                               self._node_sum(nxt.sum, current.sum),
                               nxt.next)
        if (current.next is not None
                and current.next.height == len(proof_set) - 1):
            proof_set.append(current.sum)
            current = current.next
        current = current.next
        while current is not None:
            proof_set.append(current.sum)
            current = current.next
        return self.root(), proof_set, self.proof_index, self.current_index


def verify_proof(hfac, merkle_root: bytes, proof_set, proof_index: int,
                 num_leaves: int) -> bool:
    """verify.go:31 VerifyProof — same orphan-merging index arithmetic."""
    if merkle_root is None or not proof_set or proof_index >= num_leaves:
        return False
    height = 0
    sum_ = _sum(hfac, proof_set[height])
    height += 1
    stable_end = proof_index
    while True:
        start = (proof_index // (1 << height)) * (1 << height)
        end = start + (1 << height) - 1
        if end >= num_leaves:
            break
        stable_end = end
        if len(proof_set) <= height:
            return False
        if proof_index - start < (1 << (height - 1)):
            sum_ = _sum(hfac, sum_, proof_set[height])
        else:
            sum_ = _sum(hfac, proof_set[height], sum_)
        height += 1
    if stable_end != num_leaves - 1:
        if len(proof_set) <= height:
            return False
        sum_ = _sum(hfac, sum_, proof_set[height])
        height += 1
    while height < len(proof_set):
        sum_ = _sum(hfac, proof_set[height], sum_)
        height += 1
    return sum_ == merkle_root
