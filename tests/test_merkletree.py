"""Merkle accumulator tests (reference: accumulator/merkletree semantics)."""

import hashlib

import pytest

from gnark_crypto_tpu.hashes.merkletree import Tree, verify_proof


@pytest.mark.parametrize("n", [1, 2, 3, 7, 8, 13])
def test_prove_verify_all_indices(n):
    leaves = [bytes([i]) * 32 for i in range(n)]
    for idx in range(n):
        t = Tree(hashlib.sha256)
        t.set_index(idx)
        for leaf in leaves:
            t.push(leaf)
        root, proof, pidx, num = t.prove()
        assert pidx == idx and num == n
        assert verify_proof(hashlib.sha256, root, proof, idx, n)
        # tampered proof fails
        bad = list(proof)
        bad[0] = b"\xff" * 32
        assert not verify_proof(hashlib.sha256, root, bad, idx, n)


def test_root_matches_manual_small():
    h = lambda *cs: hashlib.sha256(b"".join(cs)).digest()
    leaves = [bytes([i]) * 4 for i in range(4)]
    t = Tree(hashlib.sha256)
    for leaf in leaves:
        t.push(leaf)
    l_ = [h(x) for x in leaves]
    expect = h(h(l_[0], l_[1]), h(l_[2], l_[3]))
    assert t.root() == expect


def test_odd_leaf_root():
    # 3 leaves: root = H(H(l0,l1), l2) per Sia orphan rule
    h = lambda *cs: hashlib.sha256(b"".join(cs)).digest()
    leaves = [bytes([i]) * 4 for i in range(3)]
    t = Tree(hashlib.sha256)
    for leaf in leaves:
        t.push(leaf)
    l_ = [h(x) for x in leaves]
    assert t.root() == h(h(l_[0], l_[1]), l_[2])


def test_mimc_backed_tree():
    from gnark_crypto_tpu.hashes.mimc import MiMC
    from gnark_crypto_tpu.specs import field as fs

    def hfac():
        m = MiMC(fs.BN254_FR)
        return m

    leaves = [i.to_bytes(32, "big") for i in range(4)]
    t = Tree(hfac)
    t.set_index(2)
    for leaf in leaves:
        t.push(leaf)
    root, proof, idx, num = t.prove()
    assert verify_proof(hfac, root, proof, idx, num)
