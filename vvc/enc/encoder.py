"""All-Intra encoder driver: frames → Annex-B bitstream + reconstruction.

TPU-native analog of the reference's encoder stack
(`/root/reference/source/Lib/EncoderLib/EncLib.cpp` → EncLib::encode;
EncGOP.cpp → compressGOP (AI degenerate case); EncSlice.cpp →
compressSlice/encodeSlice; SEIEncoder.cpp → initDecodedPictureHashSEI +
libmd5).  Phases per picture (SURVEY.md §7.2 S2):

  1. batched RDO on device (vvc.enc.rdo) → partition + modes
  2. sequential reconstruction (vvc.model.recon — shared with the decoder)
     deriving quantized levels against true reconstructed neighbours
  3. host CABAC entropy pass (vvc.cabac) → slice payload
  4. NAL framing (SPS/PPS/IDR slices + decoded-picture-hash SEI)
"""
from __future__ import annotations

import hashlib

import numpy as np

from vvc.common.types import NalUnitType, SliceType
from vvc.io.nal import NalUnit, write_annexb
from vvc.io.yuv import Frame, psnr
from vvc.hls.ps import SPS, PPS, SliceHeader
from vvc.hls.write import write_sps, write_pps, write_slice_header
from vvc.cabac.engine import BinEncoder
from vvc.packer import native as native_packer
from vvc.cabac.ctx import SliceContexts
from vvc.cabac.cu_syntax import TreeWriter
from vvc.model.frame import CodingState
from vvc.model.recon import reconstruct_leaves
from vvc.enc.rdo import rdo_partition, rdo_partition_frames

SEI_PIC_HASH_MD5 = 132  # decoded_picture_hash payload type


def _hash_sei_payload(planes) -> bytes:
    out = bytearray([SEI_PIC_HASH_MD5])
    body = bytearray([0])  # hash_type 0 = MD5
    for p in planes:
        body += hashlib.md5(np.ascontiguousarray(p.astype(np.uint8)).tobytes()).digest()
    out.append(len(body))
    out += body
    out += b"\x80"  # rbsp trailing
    return bytes(out)


class Encoder:
    def __init__(self, sps: SPS, pps: PPS):
        self.sps = sps
        self.pps = pps

    def encode_frame(self, frame: Frame, poc: int, rdo_result=None):
        """Returns (nal_units, recon Frame, stats dict).

        rdo_result: optional precomputed (split_map, leaf_map, leaves) from
        the GOP-batched search (rdo_partition_frames)."""
        sps, pps = self.sps, self.pps
        qp = pps.init_qp
        bd = sps.bit_depth

        split_map, leaf_map, leaves = rdo_result if rdo_result is not None \
            else rdo_partition(frame.y, qp, bd, sps.ctu_size, sps.min_cu_size)

        recon = (np.zeros_like(frame.y), np.zeros_like(frame.cb),
                 np.zeros_like(frame.cr))
        reconstruct_leaves(leaves, recon, qp, bd,
                           orig_planes=(frame.y, frame.cb, frame.cr))
        if sps.deblocking:
            from vvc.kernels.deblock import deblock_frame
            deblock_frame(recon, leaves, qp, bd)

        # entropy pass (native packer when built; Python oracle otherwise)
        enc = (native_packer.NativeBinEncoder()
               if native_packer.available() else BinEncoder())
        ctxs = SliceContexts(qp)
        state = CodingState(sps.width, sps.height)
        writer = TreeWriter(enc, ctxs, state, sps.width, sps.height,
                            split_map, leaf_map, sps.ctu_size, sps.min_cu_size,
                            mts_enabled=sps.mts_intra)
        for cy in range(0, sps.height, sps.ctu_size):
            for cx in range(0, sps.width, sps.ctu_size):
                writer.write_ctu(cx, cy)
        enc.encode_bin_trm(1)
        payload = enc.finish()

        sh = SliceHeader(pps.pps_id, SliceType.I, poc, qp)
        slice_rbsp = write_slice_header(sh, pps.init_qp) + payload
        nals = [NalUnit(NalUnitType.IDR_N_LP, slice_rbsp),
                NalUnit(NalUnitType.SUFFIX_SEI, _hash_sei_payload(recon))]
        rec_frame = Frame(*recon, bd)
        stats = {
            "bits": sum(8 * (len(n.payload) + 2) for n in nals),
            "psnr_y": psnr(frame.y, recon[0], bd),
            "psnr_cb": psnr(frame.cb, recon[1], bd),
            "psnr_cr": psnr(frame.cr, recon[2], bd),
            "n_cu": len(leaves),
        }
        return nals, rec_frame, stats


def encode_sequence(frames, qp: int = 32, bit_depth: int = 8):
    """Encode frames (list of Frame) All-Intra → (annexb bytes, recons, stats)."""
    h, w = frames[0].y.shape
    sps = SPS(width=w, height=h, bit_depth=bit_depth, deblocking=True,
              mts_intra=True)
    pps = PPS(init_qp=qp)
    enc = Encoder(sps, pps)
    nals = [NalUnit(NalUnitType.SPS, write_sps(sps)),
            NalUnit(NalUnitType.PPS, write_pps(pps))]
    recons = []
    stats = []
    # one device dispatch for the whole sequence's RDO search (AI frames
    # are independent); host recon/entropy then proceeds per frame
    rdo_results = rdo_partition_frames([f.y for f in frames], qp, bit_depth,
                                       sps.ctu_size, sps.min_cu_size)
    for poc, f in enumerate(frames):
        n, r, s = enc.encode_frame(f, poc, rdo_results[poc])
        nals += n
        recons.append(r)
        stats.append(s)
    return write_annexb(nals), recons, stats
