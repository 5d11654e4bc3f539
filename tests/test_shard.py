"""Sharding-layer tests on the 8-virtual-device CPU mesh
(SURVEY.md §4: multi-host logic without a cluster)."""
import numpy as np
import jax
import jax.numpy as jnp

from vvc.shard.mesh import make_mesh, sharded_rdo_step
from vvc.shard.halo import exchange_tile_halos


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"tile": 4, "frame": 2}


def test_sharded_rdo_matches_single_device():
    from vvc.enc.rdo import eval_blocks
    rng = np.random.default_rng(0)
    size = 8
    orig = rng.integers(0, 256, size=(16, size, size)).astype(np.int32)
    refs = rng.integers(0, 256, size=(16, 4 * size + 3)).astype(np.int32)
    mesh = make_mesh(8, 1)
    c_sh, m_sh, tot = sharded_rdo_step(mesh, jnp.asarray(orig),
                                       jnp.asarray(refs), size, 32)
    c_1, m_1, _, _ = eval_blocks(jnp.asarray(orig), jnp.asarray(refs), size, 32, 8)
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_1))
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_1), rtol=1e-6)
    assert np.isclose(float(tot), float(np.sum(np.asarray(c_1))), rtol=1e-5)


def test_halo_exchange():
    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(1)
    stripes = rng.integers(0, 256, size=(8, 16, 16)).astype(np.int32)
    lh, rh = exchange_tile_halos(mesh, jnp.asarray(stripes), halo=4)
    lh, rh = np.asarray(lh), np.asarray(rh)
    for i in range(8):
        if i == 0:
            assert (lh[i] == 0).all()
        else:
            np.testing.assert_array_equal(lh[i], stripes[i - 1][:, -4:])
        if i == 7:
            assert (rh[i] == 0).all()
        else:
            np.testing.assert_array_equal(rh[i], stripes[i + 1][:, :4])


def test_graft_entry_single():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (64,)


def test_graft_entry_multichip():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_sequence_encode_matches_single_device_bytes():
    """The real scale-out gate (SURVEY §2.7 P-3/P-5): an All-Intra
    sequence encode with per-(frame, tile) RDO fanned over the 8-device
    mesh must produce the SAME Annex-B bytes as the single-device
    encoder."""
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    from vvc.shard.encode import encode_sequence_sharded, make_encode_mesh

    frames = [synth_frame(128, 64, t) for t in range(2)]
    bs1, rec1, _ = encode_sequence(frames, qp=32, num_tile_cols=2)
    mesh = make_encode_mesh(2, 2)
    bs2, rec2, _ = encode_sequence_sharded(frames, qp=32, num_tile_cols=2,
                                           mesh=mesh)
    assert bs1 == bs2
    for a, b in zip(rec1, rec2):
        assert (a.y == b.y).all() and (a.cb == b.cb).all()


def test_sharded_encode_decodes_bit_exact():
    from vvc.io.synth import synth_frame
    from vvc.dec.decoder import decode_stream
    from vvc.shard.encode import encode_sequence_sharded

    frames = [synth_frame(128, 64, t) for t in range(2)]
    bs, recons, _ = encode_sequence_sharded(frames, qp=32, num_tile_cols=2)
    dec, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(dec, recons):
        assert (d.y == r.y).all()
