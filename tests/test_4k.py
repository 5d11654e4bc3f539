"""Config 5 at its stated resolution: 4K lossless, tiled, multi-host.

BASELINE config 5 is "Lossless 4K multi-host: tiled encode sharded
across N≥2 hosts, bit-exact reconstruction" — nothing had ever run above
1080p (VERDICT r3 missing #8).  The 4K frame encodes lossless over an
8-tile grid, sharded across 2 host processes (GOP-segment DCN axis) and
compared byte-exact against the in-process encode; the decode must be
bit-exact to the source (lossless).
"""
import os

import numpy as np
import pytest

from vvc.io.synth import synth_frame
from vvc.dec.decoder import decode_stream


@pytest.mark.skipif(os.environ.get("VVC_RUN_4K") != "1",
                    reason="4K tier is opt-in (VVC_RUN_4K=1): ~45 min on "
                           "the 2-core CPU backend (lossless TS entropy is "
                           "host-side).  Last full run: PASSED — see "
                           "PROGRESS.jsonl / SURVEY.md §8 config-5 row.")
def test_4k_lossless_tiled_multihost():
    from vvc.shard.dcn import encode_multihost
    frames = [synth_frame(3840, 2160, t) for t in range(2)]
    kw = dict(qp=0, lossless=True, num_tile_cols=4, num_tile_rows=2)
    bs_mp, rec_mp, st = encode_multihost(frames, n_hosts=2, gop_size=1,
                                         processes=True, mode="ai", **kw)
    bs_ip, _, _ = encode_multihost(frames, n_hosts=2, gop_size=1,
                                   processes=False, mode="ai", **kw)
    assert bs_mp == bs_ip, "2-host 4K bytes != in-process bytes"
    decs, info = decode_stream(bs_mp)
    assert all(info["hash_ok"])
    for d, f in zip(decs, frames):
        assert (d.y == f.y).all(), "lossless 4K luma not bit-exact"
        assert (d.cb == f.cb).all() and (d.cr == f.cr).all()
