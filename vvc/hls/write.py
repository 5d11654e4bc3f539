"""HLS writers: SPS/PPS/slice-header RBSP serialization.

TPU-native analog of the reference's HLSWriter
(`/root/reference/source/Lib/EncoderLib/VLCWriter.cpp` → codeSPS / codePPS /
codeSliceHeader).  Field order follows the spec shape where implemented;
fields not yet supported are simply absent and the parser mirrors that
([verify] — to be made spec-complete as tools land).
"""
from __future__ import annotations

from vvc.io.bitio import BitWriter
from vvc.hls.ps import SPS, PPS, SliceHeader


def write_sps(sps: SPS) -> bytes:
    bw = BitWriter()
    bw.write(sps.sps_id, 4)
    bw.write(sps.chroma_format_idc, 2)
    bw.write_ue(sps.width)
    bw.write_ue(sps.height)
    bw.write_ue(sps.bit_depth - 8)
    bw.write_ue((sps.ctu_size.bit_length() - 1) - 5)       # log2_ctu_size_minus5
    bw.write_ue((sps.min_cu_size.bit_length() - 1) - 2)    # log2_min_cu_minus2
    bw.write_ue(sps.max_mtt_depth_intra)
    for flag in (sps.mip, sps.isp, sps.mrl, sps.cclm, sps.mts_intra,
                 sps.lfnst, sps.dep_quant, sps.sao, sps.alf, sps.lmcs,
                 sps.deblocking, sps.lossless, sps.bdof, sps.dmvr,
                 sps.affine):
        bw.write_flag(flag)
    bw.byte_align()
    return bw.get_bytes()


def write_pps(pps: PPS) -> bytes:
    bw = BitWriter()
    bw.write(pps.pps_id, 6)
    bw.write(pps.sps_id, 4)
    bw.write_se(pps.init_qp - 26)
    bw.write_se(pps.cb_qp_offset)
    bw.write_se(pps.cr_qp_offset)
    bw.write_ue(pps.num_tile_cols - 1)
    bw.write_ue(pps.num_tile_rows - 1)
    bw.write_flag(pps.wpp)
    bw.byte_align()
    return bw.get_bytes()


def write_slice_header(sh: SliceHeader, init_qp: int,
                       entry_sizes=None, alf=None, lmcs_cw=None,
                       lmcs_enabled: bool = False) -> bytes:
    """Slice header RBSP bits (byte-aligned); CABAC payload is appended by
    the caller (slice_data starts at a byte boundary, spec 7.3.7).

    entry_sizes: byte lengths of the tile substreams; all but the last are
    written as entry-point offsets (spec sh_entry_point_offset_minus1).
    alf: (luma_coeffs|None, ctu_flag_list|None, chroma_coeffs|None) —
    round-1 APS stand-in ([verify]: the reference carries ALF in APS NALs
    with CABAC ctb flags)."""
    bw = BitWriter()
    bw.write(sh.pps_id, 6)
    bw.write_ue(sh.slice_type)
    bw.write(sh.poc & 0xFFFF, 16)
    bw.write_se(sh.qp - init_qp)
    if sh.slice_type != 2:            # P/B: explicit RPL as POC deltas
        bw.write_ue(len(sh.l0_deltas))
        for d in sh.l0_deltas:
            bw.write_se(d)
        if sh.slice_type == 0:        # B
            bw.write_ue(len(sh.l1_deltas))
            for d in sh.l1_deltas:
                bw.write_se(d)
    if lmcs_enabled or lmcs_cw is not None:
        # the present-flag is written whenever the SPS enables LMCS (the
        # parser mirrors that unconditionally); inter slices that skip the
        # mapping write 0 — keeps streams decodable (spec sh_lmcs_used_flag)
        bw.write_flag(lmcs_cw is not None)
        if lmcs_cw is not None:
            for c in lmcs_cw:
                bw.write_ue(int(c))
    if alf is not None:
        # luma = (coeffs [nf,12], clips [nf], fmap [25]) — classified ALF
        # ([verify]: the reference carries this in APS NALs, 7.3.2.5)
        luma, flags, chroma = alf
        bw.write_flag(luma is not None)
        if luma is not None:
            coeffs, clips, fmap = luma
            nf = len(coeffs)
            bw.write_ue(nf - 1)
            for k in fmap:
                bw.write_ue(int(k))
            for fi in range(nf):
                for c in coeffs[fi]:
                    bw.write_se(int(c))
                bw.write_ue(int(clips[fi]))
            for f in flags:
                bw.write_flag(f)
        bw.write_flag(chroma is not None)
        if chroma is not None:
            for c in chroma:
                bw.write_se(int(c))
    if entry_sizes and len(entry_sizes) > 1:
        for sz in entry_sizes[:-1]:
            bw.write_ue(sz - 1)
    bw.byte_align()
    return bw.get_bytes()
