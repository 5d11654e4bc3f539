"""CABAC engine round-trip tests (reference behavior: BinEncoder/BinDecoder
self-consistency; the reference has no unit suite — SURVEY.md §4 golden
path A replaces it with oracle tests)."""
import random

import pytest

from vvc.cabac.engine import BinEncoder, BinDecoder, ContextModel


def _roundtrip(ops, n_ctx, seed_states):
    enc = BinEncoder()
    ctxs = [ContextModel(s) for s in seed_states]
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[2], ctxs[op[1]])
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
        elif op[0] == "eps":
            enc.encode_bins_ep(op[1], op[2])
        else:
            enc.encode_bin_trm(op[1])
    data = enc.finish()
    dec = BinDecoder(data)
    ctxs = [ContextModel(s) for s in seed_states]
    for j, op in enumerate(ops):
        if op[0] == "ctx":
            assert dec.decode_bin(ctxs[op[1]]) == op[2], (j, op)
        elif op[0] == "ep":
            assert dec.decode_bin_ep() == op[1], (j, op)
        elif op[0] == "eps":
            assert dec.decode_bins_ep(op[2]) == op[1], (j, op)
        else:
            assert dec.decode_bin_trm() == op[1], (j, op)
    return data


@pytest.mark.parametrize("seed", range(20))
def test_random_roundtrip(seed):
    random.seed(seed)
    n_ctx = 12
    states = [random.randint(1, 127) for _ in range(n_ctx)]
    ops = []
    for _ in range(random.randint(1, 4000)):
        k = random.random()
        if k < 0.55:
            ci = random.randrange(n_ctx)
            b = 1 if random.random() < (0.05 + 0.9 * ci / n_ctx) else 0
            ops.append(("ctx", ci, b))
        elif k < 0.8:
            ops.append(("ep", random.randint(0, 1)))
        elif k < 0.97:
            n = random.randint(1, 16)
            ops.append(("eps", random.getrandbits(n), n))
        else:
            ops.append(("trm", 0))
    ops.append(("trm", 1))
    _roundtrip(ops, n_ctx, states)


def test_extreme_bias_carry_paths():
    """Long runs of improbable bins force carries / 0xFF ripples."""
    for bias_bin in (0, 1):
        ops = [("ctx", 0, bias_bin)] * 2000 + [("ctx", 0, 1 - bias_bin)] * 5 + [("trm", 1)]
        data = _roundtrip(ops, 1, [64])
        # highly predictable bins must compress far below 1 bit/bin
        assert len(data) * 8 < 900


def test_all_ep_is_incompressible():
    random.seed(7)
    ops = [("ep", random.randint(0, 1)) for _ in range(4096)] + [("trm", 1)]
    data = _roundtrip(ops, 1, [64])
    assert abs(len(data) * 8 - 4096) < 64


def test_empty_stream():
    _roundtrip([("trm", 1)], 1, [64])
