import numpy as np
import pytest

from vp8oclenc_tpu.entropy.boolcoder import BoolEncoder, BoolDecoder, pack_bools
from vp8oclenc_tpu import tables


def test_roundtrip_random_streams():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 2000))
        probs = rng.integers(1, 255, size=n).astype(np.uint8)
        bits = rng.integers(0, 2, size=n).astype(np.uint8)
        enc = BoolEncoder()
        enc.put_many(probs, bits)
        data = enc.flush()
        dec = BoolDecoder(data)
        out = [dec.get(int(p)) for p in probs]
        assert out == bits.tolist(), f"trial {trial}"


def test_roundtrip_extreme_probs():
    # long runs at prob 1 and 254 exercise carry propagation
    probs = np.array([1] * 500 + [254] * 500 + [128] * 100, dtype=np.uint8)
    bits = np.array([1] * 500 + [0] * 500 + [1, 0] * 50, dtype=np.uint8)
    data = pack_bools(probs, bits)
    dec = BoolDecoder(data)
    for p, b in zip(probs.tolist(), bits.tolist()):
        assert dec.get(p) == b


def test_literals_and_flags():
    enc = BoolEncoder()
    enc.put_flag(1)
    enc.put_literal(0x5A, 8)
    enc.put_literal(3, 2)
    data = enc.flush()
    dec = BoolDecoder(data)
    assert dec.get_flag() == 1
    assert dec.get_literal(8) == 0x5A
    assert dec.get_literal(2) == 3


def test_tree_coding_roundtrip():
    # encode every bmode value via (bits,size) tables, decode via the tree
    probs = tables.BMODE_PROB
    enc = BoolEncoder()
    for v in range(10):
        code, size = int(tables.BMODE_BITS[v]), int(tables.BMODE_SIZE[v])
        i = 0
        for s in range(size - 1, -1, -1):
            b = (code >> s) & 1
            enc.put(int(probs[i >> 1]), b)
            i = int(tables.BMODE_TREE[i + b])
    data = enc.flush()
    dec = BoolDecoder(data)
    for v in range(10):
        assert dec.get_tree(tables.BMODE_TREE, probs) == v


def test_coeff_token_paths_match_tree():
    nodes, bits, lens = (tables.COEFF_TOKEN_NODES, tables.COEFF_TOKEN_BITS,
                         tables.COEFF_TOKEN_LENS)
    # spot-check a few known codes from the spec
    assert lens[tables.DCT_EOB] == 1 and bits[tables.DCT_EOB, 0] == 0
    assert lens[tables.DCT_0] == 2 and list(bits[tables.DCT_0, :2]) == [1, 0]
    assert lens[tables.DCT_1] == 3 and list(bits[tables.DCT_1, :3]) == [1, 1, 0]
    assert lens[tables.DCT_CAT6] == 7 and list(bits[tables.DCT_CAT6, :7]) == [1] * 7
    # roundtrip every token through the bool coder using path tables
    enc = BoolEncoder()
    probs = np.arange(30, 30 + 11).astype(np.uint8)
    for tok in range(tables.NUM_DCT_TOKENS):
        for s in range(int(lens[tok])):
            enc.put(int(probs[nodes[tok, s]]), int(bits[tok, s]))
    dec = BoolDecoder(enc.flush())
    for tok in range(tables.NUM_DCT_TOKENS):
        assert dec.get_tree(tables.COEFF_TREE, probs) == tok


def test_zigzag_inverse():
    z, iz = tables.ZIGZAG, tables.INV_ZIGZAG
    a = np.arange(16)
    assert np.array_equal(a[z][iz], a)
    # A[i] = B[zigzag[i]]  <=>  A[inv_zigzag[i]] = B[i]
    B = np.random.default_rng(1).integers(0, 100, 16)
    A1 = B[z]
    A2 = np.empty_like(B)
    A2[iz] = B
    assert np.array_equal(A1, A2)
