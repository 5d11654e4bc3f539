"""Native C++ packer vs Python oracle: byte-identical streams, identical
decode, identical context evolution (SURVEY.md §5.2: the native packer is
tested against the Python normative oracle)."""
import random

import numpy as np
import pytest

from vvc.packer import native
from vvc.cabac.engine import BinEncoder, BinDecoder
from vvc.cabac.ctx import SliceContexts
from vvc.cabac.residual import write_residual, read_residual

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native packer not built")


def _random_ops(seed, n_max=3000):
    random.seed(seed)
    ops = []
    for _ in range(random.randint(1, n_max)):
        k = random.random()
        if k < 0.55:
            ops.append(("ctx", random.randrange(10), random.randint(0, 1)))
        elif k < 0.8:
            ops.append(("ep", random.randint(0, 1)))
        elif k < 0.97:
            n = random.randint(1, 16)
            ops.append(("eps", random.getrandbits(n), n))
        else:
            ops.append(("trm", 0))
    ops.append(("trm", 1))
    return ops


def _drive_enc(enc, ctxs, ops):
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[2], ctxs("SIG_LUMA", op[1]))
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
        elif op[0] == "eps":
            enc.encode_bins_ep(op[1], op[2])
        else:
            enc.encode_bin_trm(op[1])
    return enc.finish()


@pytest.mark.parametrize("seed", range(8))
def test_native_encoder_byte_identical(seed):
    ops = _random_ops(seed)
    c1, c2 = SliceContexts(), SliceContexts()
    py = _drive_enc(BinEncoder(), c1, ops)
    nat = _drive_enc(native.NativeBinEncoder(), c2, ops)
    assert py == nat
    assert (c1.states == c2.states).all()  # identical adaptation


@pytest.mark.parametrize("seed", range(8))
def test_native_decoder_matches(seed):
    ops = _random_ops(seed)
    ctxs = SliceContexts()
    data = _drive_enc(BinEncoder(), ctxs, ops)
    cd = SliceContexts()
    dec = native.NativeBinDecoder(data)
    for op in ops:
        if op[0] == "ctx":
            assert dec.decode_bin(cd("SIG_LUMA", op[1])) == op[2]
        elif op[0] == "ep":
            assert dec.decode_bin_ep() == op[1]
        elif op[0] == "eps":
            assert dec.decode_bins_ep(op[2]) == op[1]
        else:
            assert dec.decode_bin_trm() == op[1]


@pytest.mark.parametrize("seed", range(10))
def test_native_residual_roundtrip_and_equality(seed):
    rng = np.random.default_rng(seed)
    s = int(rng.choice([4, 8, 16, 32]))
    is_luma = bool(rng.integers(0, 2))
    lv = np.zeros((s, s), dtype=np.int32)
    n = int(rng.integers(1, s * s // 2 + 2))
    idx = rng.choice(s * s, size=n, replace=False)
    vals = rng.integers(1, 2000, size=n)
    lv.flat[idx] = vals * rng.choice([-1, 1], size=n)

    # python oracle stream (BinEncoder has no fast path → python loop)
    cp = SliceContexts()
    pe = BinEncoder()
    write_residual(pe, cp, lv, is_luma)
    pe.encode_bin_trm(1)
    py_stream = pe.finish()

    cn = SliceContexts()
    ne = native.NativeBinEncoder()
    ne.write_residual(cn, lv, is_luma)
    ne.encode_bin_trm(1)
    nat_stream = ne.finish()
    assert py_stream == nat_stream
    assert (cp.states == cn.states).all()

    # native decode of native stream
    cd = SliceContexts()
    nd = native.NativeBinDecoder(nat_stream)
    out = nd.read_residual(cd, s, is_luma)
    assert nd.decode_bin_trm() == 1
    assert (out == lv).all()

    # python decode of native stream
    cd2 = SliceContexts()
    pd = BinDecoder(nat_stream)
    out2 = read_residual(pd, cd2, s, is_luma)
    assert (out2 == lv).all()


def test_encoder_driver_uses_native_and_stays_bit_exact():
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(96, 48, t) for t in range(2)]
    bs, recons, _ = encode_sequence(frames, qp=32)
    dec, info = decode_stream(bs)
    for d, r in zip(dec, recons):
        assert (d.y == r.y).all() and (d.cb == r.cb).all() and (d.cr == r.cr).all()
    assert all(info["hash_ok"])


def test_native_recon_matches_numpy_oracle():
    from vvc.packer import native_recon
    if not native_recon.available():
        pytest.skip("native recon not built")
    from vvc.io.synth import synth_frame
    from vvc.enc.rdo import rdo_partition
    from vvc.model.recon import reconstruct_leaves
    import copy
    f = synth_frame(96, 64, 0)
    _, _, leaves = rdo_partition(f.y, 30, 8)
    leaves_a = copy.deepcopy(leaves)
    leaves_b = copy.deepcopy(leaves)
    rec_a = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    rec_b = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    reconstruct_leaves(leaves_a, rec_a, 30, 8, (f.y, f.cb, f.cr), use_native=False)
    reconstruct_leaves(leaves_b, rec_b, 30, 8, (f.y, f.cb, f.cr), use_native=True)
    for pa, pb in zip(rec_a, rec_b):
        assert (pa == pb).all()
    for la, lb in zip(leaves_a, leaves_b):
        for attr in ("lev_y", "lev_cb", "lev_cr"):
            va, vb = getattr(la, attr), getattr(lb, attr)
            assert (va is None) == (vb is None)
            if va is not None:
                assert (va == vb).all()
    # decode mode equality too
    rec_c = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    rec_d = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    reconstruct_leaves(leaves_a, rec_c, 30, 8, None, use_native=False)
    reconstruct_leaves(leaves_a, rec_d, 30, 8, None, use_native=True)
    for pc, pd in zip(rec_c, rec_d):
        assert (pc == pd).all()
    for pa, pc in zip(rec_a, rec_c):
        assert (pa == pc).all()


class TestNativeTreeWriter:
    def test_bytes_equal_python_writer(self):
        """The native C++ tree writer (tw_write) must produce byte-identical
        streams to the Python TreeWriter across feature combinations."""
        import vvc.enc.encoder as E
        from vvc.enc.encoder import encode_sequence
        from vvc.io.synth import synth_frame
        from vvc.packer import native as npk
        if not npk.available():
            import pytest
            pytest.skip("native packer unavailable")
        frames = [synth_frame(128, 64, t) for t in range(2)]
        for kw in (dict(), dict(num_tile_cols=2), dict(wpp=True),
                   dict(lossless=True)):
            try:
                E.USE_NATIVE_TREE = True
                bs_n, _, _ = encode_sequence(frames, qp=32, **kw)
                E.USE_NATIVE_TREE = False
                bs_p, _, _ = encode_sequence(frames, qp=32, **kw)
            finally:
                E.USE_NATIVE_TREE = True
            assert bs_n == bs_p, f"native/python stream mismatch for {kw}"
